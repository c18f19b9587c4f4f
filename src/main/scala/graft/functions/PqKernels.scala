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

  /** out[p] = (Σ_i vec[i]·mat[p][i]) · scale, ascending fold. */
  def matVecFold(vec: ArrayData, mat: Array[Array[Double]],
      scale: Double): ArrayData = {
    val out = new Array[Double](mat.length)
    var p = 0
    while (p < mat.length) {
      val row = mat(p)
      var acc = 0.0
      var i = 0
      while (i < row.length) {
        acc += vec.getFloat(i).toDouble * row(i)
        i += 1
      }
      out(p) = acc * scale
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Per-dim int8 quantize→dequantize with Spark's HALF_UP decimal
    * round (BigDecimal — bit-identical to `round(x, 0)` in SQL). */
  def sq8Recon(vec: ArrayData, mn: Array[Double], mx: Array[Double]): ArrayData = {
    val out = new Array[Double](mn.length)
    var i = 0
    while (i < mn.length) {
      val m = mn(i)
      val M = mx(i)
      out(i) = if (M > m) {
        val code = java.math.BigDecimal
          .valueOf((vec.getFloat(i).toDouble - m) * 255.0 / (M - m))
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()
        m + code * (M - m) / 255.0
      } else m
      i += 1
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

/** `mat_vec_fold(vec, matrix, scale)`: out[p] = (Σ_i vec[i]·m[p][i])·scale,
  * ascending-index fold — the native form of the JL random-projection
  * HOF (outDim·dim boxed lambda steps per row interpreted). */
case class MatVecFold(child: Expression, mat: Array[Array[Double]],
    scale: Double) extends UnaryExpression {

  require(mat.nonEmpty && mat.forall(_.length == mat(0).length),
    "mat_vec_fold: empty or ragged matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mat_vec_fold requires an array<float> argument, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec_fold"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.matVecFold(input.asInstanceOf[ArrayData], mat, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("mvfMat", mat, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernels.matVecFold($c, $mRef, $scale);")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecFold =
    copy(child = newChild)
}

object MatVecFold {
  def apply(vec: Column, mat: Seq[Seq[Double]], scale: Double): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("mat_vec_fold",
      vec, org.apache.spark.sql.functions.typedLit(mat),
      org.apache.spark.sql.functions.lit(scale))
  }
}

/** `sq8_recon(vec, mn, mx)`: per-dimension int8 quantize→dequantize,
  * m + round((x−m)·255/(M−m))·(M−m)/255 (M>m; else m), where round is
  * Spark's HALF_UP decimal rounding — replicated via BigDecimal so the
  * kernel is bit-identical to the `round(...)` SQL the oracle replays. */
case class Sq8Recon(child: Expression, mn: Array[Double], mx: Array[Double])
  extends UnaryExpression {

  require(mn.length == mx.length && mn.nonEmpty, "sq8_recon: bad bounds")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_recon requires an array<float> argument, got $other")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "sq8_recon"

  override protected def nullSafeEval(input: Any): Any =
    PqKernels.sq8Recon(input.asInstanceOf[ArrayData], mn, mx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sq8Mn", mn, "double[]")
    val mxRef = ctx.addReferenceObj("sq8Mx", mx, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PqKernels.sq8Recon($c, $mnRef, $mxRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Sq8Recon =
    copy(child = newChild)
}

object Sq8Recon {
  def apply(vec: Column, mn: Seq[Double], mx: Seq[Double]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("sq8_recon",
      vec, org.apache.spark.sql.functions.typedLit(mn),
      org.apache.spark.sql.functions.typedLit(mx))
  }
}
