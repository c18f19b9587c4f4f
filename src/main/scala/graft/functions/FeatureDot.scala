package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StructType}

/** `graft_feature_dot(fx, weights)`: Σ x·w[b] over a sparse feature
  * array `fx: array<struct<b: long, x: double>>` against a dense
  * weight vector baked into the plan as a literal — the inner product
  * every logistic-regression score in the GD family computes
  * (QualityModel score folds; the "parameters small, data huge"
  * layout).
  *
  * This is the CODEGEN'D replacement for the interpreted
  * `aggregate(fx, 0.0, (acc, e) -> acc + e.x * element_at(w, e.b+1))`
  * higher-order fold: same left-to-right summation order over the same
  * elements (bit-identical IEEE result — oracle equality is
  * unaffected), but a tight primitive loop instead of per-element
  * lambda interpretation. Out-of-range buckets contribute 0 (the fold
  * form never sees one by construction; the guard makes the kernel
  * total). Null array → null; null elements/fields are skipped.
  */
case class FeatureDot(child: Expression, weights: Seq[Double])
  extends UnaryExpression {

  // Seq gives the case class VALUE equality, so identical kernels (e.g.
  // the K all-zero score dots of GD iteration 1) canonicalize and
  // common-subexpression-eliminate; the primitive array the loops index
  // is derived once.
  @transient private lazy val wArr: Array[Double] = weights.toArray

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_feature_dot"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(st: StructType, _)
        if st.length == 2 && st(0).dataType == LongType &&
          st(1).dataType == DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_feature_dot expects array<struct<b: bigint, x: double>>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val r = arr.getStruct(i, 2)
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
          val b = r.getLong(0)
          if (b >= 0 && b < wArr.length) s += r.getDouble(1) * wArr(b.toInt)
        }
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
      val r = ctx.freshName("r")
      val b = ctx.freshName("b")
      val s = ctx.freshName("s")
      s"""
        |org.apache.spark.sql.catalyst.util.ArrayData $arr = $c;
        |double $s = 0.0;
        |int $n = $arr.numElements();
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$arr.isNullAt($i)) {
        |    org.apache.spark.sql.catalyst.InternalRow $r = $arr.getStruct($i, 2);
        |    if (!$r.isNullAt(0) && !$r.isNullAt(1)) {
        |      long $b = $r.getLong(0);
        |      if ($b >= 0 && $b < ${weights.length}L) {
        |        $s += $r.getDouble(1) * $wRef[(int) $b];
        |      }
        |    }
        |  }
        |}
        |${ev.value} = $s;
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): FeatureDot =
    copy(child = newChild)
}

object FeatureDot {
  /** Column surface; registers the SQL function on the active session
    * (idempotent), same contract as [[TDigestQuantile]]. Weights ride
    * as one array literal (the builder unpacks it into the kernel's
    * primitive array). */
  def apply(fx: Column, weights: Seq[Double]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("graft_feature_dot",
      fx, org.apache.spark.sql.functions.typedLit(weights))
  }
}
