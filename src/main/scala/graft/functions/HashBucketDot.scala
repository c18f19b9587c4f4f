package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `graft_hash_dot(hs, weights)`: Σ w[h mod |w|] over a token-hash
  * array — the zero-join inference sum behind
  * [[graft.operators.QualityModel.scoreInline]] (per-token weight
  * lookup into a model vector riding as a plan literal; dividing by
  * |hs| outside this kernel turns it into the normalized
  * bag-of-words score).
  *
  * Codegen'd replacement for the interpreted
  * `aggregate(hs, 0.0, (acc, h) -> acc + coalesce(w_map[h % B], 0.0))`
  * fold: the same left-to-right order over the same elements, with a
  * dense double[] (absent buckets = 0.0) instead of a sparse map
  * literal — bit-identical result (adding 0.0 and skipping are the
  * same under round-to-nearest since no partial sum is −0.0: weights
  * come from BigDecimal rounding, which never yields −0.0). Negative
  * remainders (impossible for the md5-fold hashes, which are
  * non-negative) skip, matching the sparse map's missing-key → 0. */
case class HashBucketDot(child: Expression, weights: Seq[Double])
  extends UnaryExpression {

  // Seq for value equality (canonicalization/CSE); primitive array for
  // the loops. An EMPTY weight vector returns 0.0 (the sparse map's
  // every-key-missing behavior) instead of a modulo-by-zero crash.
  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_hash_dot"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_hash_dot expects array<bigint>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    if (wArr.length == 0) return 0.0
    var s = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val idx = arr.getLong(i) % wArr.length
        if (idx >= 0) s += wArr(idx.toInt)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", wArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val arr = ctx.freshName("arr")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val idx = ctx.freshName("idx")
      val s = ctx.freshName("s")
      s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $arr = $c;
        |double $s = 0.0;
        |int $n = $arr.numElements();
        |for (int $i = 0; ${wArr.length} > 0 && $i < $n; $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    long $idx = $arr.getLong($i) % ${wArr.length}L;
        |    if ($idx >= 0) $s += $wRef[(int) $idx];
        |  }
        |}
        |${ev.value} = $s;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashBucketDot =
    copy(child = newChild)
}

object HashBucketDot {
  /** Column surface; registers the SQL function on the active session
    * (idempotent), same contract as [[FeatureDot]]. */
  def apply(hs: Column, weights: Seq[Double]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("graft_hash_dot",
      hs, org.apache.spark.sql.functions.typedLit(weights))
  }
}
