package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Merging t-digest (Dunning's MergingDigest design, public algorithm):
  * a MERGEABLE quantile sketch — the mechanism the reference's
  * `_quantile.py:76` uses for distributed quantiles. Centroids carry
  * (mean, weight); the k1 scale function k(q) = (δ/2π)·asin(2q−1)
  * bounds each centroid's quantile span so resolution concentrates at
  * the tails. Buffered points amortize the merge: O(δ) memory, one
  * sort per 512 adds.
  *
  * This sketch complements — does not replace — the engine's quantile
  * surface: `approx_percentile` (GK) stays the default and
  * `operators.Quantiles` the exact path; the t-digest is the mergeable
  * low-memory option with tail-accurate rank error.
  */
final class TDigestBuffer(val compression: Double) extends Serializable {
  var means: Array[Double] = Array.empty
  var weights: Array[Double] = Array.empty
  var total: Double = 0.0
  private val bufCap = 512
  @transient private var bufM: Array[Double] = _
  @transient private var bufW: Array[Double] = _
  private var bufN = 0

  def add(x: Double, w: Double = 1.0): Unit = {
    if (bufM == null) { bufM = new Array[Double](bufCap); bufW = new Array[Double](bufCap) }
    if (bufN == bufCap) compress()
    bufM(bufN) = x; bufW(bufN) = w; bufN += 1
  }

  def addAll(other: TDigestBuffer): Unit = {
    other.compress()
    var i = 0
    while (i < other.means.length) { add(other.means(i), other.weights(i)); i += 1 }
  }

  private def k(q: Double): Double =
    compression / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)
  private def kInv(kk: Double): Double =
    (math.sin(kk * (2 * math.Pi) / compression) + 1) / 2

  /** Fold the point buffer into the centroid set: sort all by mean, then
    * one merge pass absorbing neighbors while the combined centroid's
    * quantile span stays within one k-unit. */
  def compress(): Unit = {
    if (bufN == 0) return
    val m = means.length + bufN
    val pairs = new Array[(Double, Double)](m)
    var i = 0
    while (i < means.length) { pairs(i) = (means(i), weights(i)); i += 1 }
    var j = 0
    while (j < bufN) { pairs(i + j) = (bufM(j), bufW(j)); j += 1 }
    bufN = 0
    java.util.Arrays.sort(pairs, Ordering.by((p: (Double, Double)) => p._1))
    total = { var s = 0.0; var t = 0; while (t < m) { s += pairs(t)._2; t += 1 }; s }
    val outM = new scala.collection.mutable.ArrayBuffer[Double](m.min(4 * compression.toInt))
    val outW = new scala.collection.mutable.ArrayBuffer[Double](m.min(4 * compression.toInt))
    var qSoFar = 0.0
    var qLimit = kInv(k(0.0) + 1)
    var curM = pairs(0)._1
    var curW = pairs(0)._2
    i = 1
    while (i < m) {
      val (cm, cw) = pairs(i)
      if (qSoFar + (curW + cw) / total <= qLimit) {
        curM += (cm - curM) * cw / (curW + cw) // weighted-mean absorb
        curW += cw
      } else {
        outM += curM; outW += curW
        qSoFar += curW / total
        qLimit = kInv(k(qSoFar) + 1)
        curM = cm; curW = cw
      }
      i += 1
    }
    outM += curM; outW += curW
    means = outM.toArray
    weights = outW.toArray
  }

  /** Quantile estimate: centroid i sits at cumulative weight
    * (sum of previous weights) + w_i/2; piecewise-linear interpolation
    * between neighbors, clamped to the extreme centroid means. */
  def quantile(q: Double): Option[Double] = {
    compress()
    val n = means.length
    if (n == 0) return None
    if (n == 1) return Some(means(0))
    val target = q * total
    var cum = 0.0
    var i = 0
    var prevPos = 0.0
    var prevMean = means(0)
    while (i < n) {
      val pos = cum + weights(i) / 2
      if (target <= pos) {
        return Some(
          if (i == 0) means(0)
          else prevMean + (means(i) - prevMean) * (target - prevPos) / (pos - prevPos))
      }
      cum += weights(i)
      prevPos = pos; prevMean = means(i)
      i += 1
    }
    Some(means(n - 1))
  }

  def serialized: Array[Byte] = {
    compress()
    val bb = ByteBuffer.allocate(8 + 4 + 16 * means.length)
    bb.putDouble(compression).putInt(means.length)
    var i = 0
    while (i < means.length) { bb.putDouble(means(i)).putDouble(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigestBuffer {
  def deserialize(bytes: Array[Byte]): TDigestBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TDigestBuffer(bb.getDouble)
    val n = bb.getInt
    buf.means = new Array[Double](n)
    buf.weights = new Array[Double](n)
    var i = 0
    var tot = 0.0
    while (i < n) {
      buf.means(i) = bb.getDouble; buf.weights(i) = bb.getDouble
      tot += buf.weights(i); i += 1
    }
    buf.total = tot
    buf
  }
}

/** `tdigest_quantile(col, q[, compression])`: t-digest quantile
  * estimate as a typed imperative aggregate — partial buffers are
  * serialized centroid sets merged associatively, so the plan gets
  * map-side partial aggregation like any built-in agg. */
case class TDigestQuantile(
    child: Expression,
    q: Double,
    compression: Double = 100.0,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuffer] with UnaryLike[Expression] {

  require(q >= 0 && q <= 1, s"tdigest_quantile: q must be in [0,1], got $q")
  require(compression >= 10, s"tdigest_quantile: compression must be >= 10, got $compression")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_quantile"

  override def createAggregationBuffer(): TDigestBuffer = new TDigestBuffer(compression)

  override def update(buffer: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(v match {
      case d: Double => d
      case f: Float => f.toDouble
      case l: Long => l.toDouble
      case i: Int => i.toDouble
      case s: Short => s.toDouble
      case b: Byte => b.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"tdigest_quantile: non-numeric input $other")
    })
    buffer
  }

  override def merge(buffer: TDigestBuffer, input: TDigestBuffer): TDigestBuffer = {
    buffer.addAll(input); buffer
  }

  override def eval(buffer: TDigestBuffer): Any =
    buffer.quantile(q).map(Double.box).orNull

  override def serialize(buffer: TDigestBuffer): Array[Byte] = buffer.serialized
  override def deserialize(bytes: Array[Byte]): TDigestBuffer =
    TDigestBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestQuantile =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TDigestQuantile =
    copy(child = newChild)
}

object TDigestQuantile {
  /** Column surface; registers the SQL function on the active session
    * (idempotent), same contract as [[ArrayDot]]. */
  def apply(col: Column, q: Double, compression: Double): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("tdigest_quantile",
      col, org.apache.spark.sql.functions.lit(q),
      org.apache.spark.sql.functions.lit(compression))
  }
  def apply(col: Column, q: Double): Column = apply(col, q, 100.0)
}
