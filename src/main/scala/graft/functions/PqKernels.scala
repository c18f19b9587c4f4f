package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native product-quantization kernel: fused encode+reconstruct of a
  * float-vector column against a plan-time codebook.
  *
  * The HOF formulation (per subspace: `transform` over codewords of an
  * `aggregate` distance fold, then `array_position(array_min)` and a
  * `slice`) is interpreted — m·ks·subDim lambda steps with boxed
  * doubles per row (m=4, ks=8, subDim=16 → 512 steps), which dominated
  * `q_pq_topk`/`q_ivf_pq_topk`. This compiles to a primitive triple
  * loop with the identical arithmetic:
  *
  *  - distance folds accumulate `(vec[i].toDouble − cb[c][i])²` in
  *    ascending index order, starting from 0.0 (the `aggregate` order);
  *  - the winning codeword is the FIRST index attaining the minimum
  *    (the `array_position(dists, array_min(dists))` tie rule — strict
  *    `<` while scanning);
  *  - the output is the winning codeword's double slice.
  *
  * Bit-for-bit equal to the interpreted form and to the SQL replay in
  * the oracles (differentially spec'd in SimilaritySpec).
  */
object PqKernels {

  /** `vec` float array (length m·subDim), `cb` ks×(m·subDim) doubles →
    * per-subspace nearest-codeword reconstruction as doubles. */
  def reconstruct(vec: ArrayData, cb: Array[Array[Double]], m: Int): ArrayData = {
    val dim = cb(0).length
    val subDim = dim / m
    val out = new Array[Double](dim)
    var j = 0
    while (j < m) {
      val base = j * subDim
      var best = 0
      var bestDist = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cw = cb(c)
        var acc = 0.0
        var i = 0
        while (i < subDim) {
          val d = vec.getFloat(base + i).toDouble - cw(base + i)
          acc += d * d
          i += 1
        }
        if (acc < bestDist) { bestDist = acc; best = c }
        c += 1
      }
      System.arraycopy(cb(best), base, out, base, subDim)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `pq_reconstruct(vec)` against a construction-time codebook — the
  * codebook and subspace count are plan constants (like the LSH plane
  * matrices), carried on the expression itself and shipped to codegen
  * via a reference object. */
case class PqReconstruct(child: Expression, cb: Array[Array[Double]], m: Int)
  extends UnaryExpression {

  require(cb.nonEmpty, "pq_reconstruct: empty codebook")
  require(m >= 1 && cb(0).length % m == 0,
    s"pq_reconstruct: dim ${cb(0).length} not divisible by m $m")
  require(cb.forall(_.length == cb(0).length), "pq_reconstruct: ragged codebook")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_reconstruct requires an array<float> argument, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_reconstruct"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.reconstruct(input.asInstanceOf[ArrayData], cb, m)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernels.reconstruct($c, $cbRef, $m);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqReconstruct =
    copy(child = newChild)
}

object PqReconstruct {
  /** Column surface; the codebook ships as a nested-array literal and
    * is unpacked once by the registration builder (same contract as
    * [[ArrayDot]]'s session registration). */
  def apply(vec: Column, codebook: Array[Seq[Double]], m: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("pq_reconstruct",
      vec, org.apache.spark.sql.functions.typedLit(codebook.toSeq),
      org.apache.spark.sql.functions.lit(m))
  }
}
