package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-defined aggregates — the engine's answer to the reference's custom
  * `Aggregation` surface (`/root/reference/dask_expr/_groupby.py:95-155`)
  * and `_cumulative.py:11` CumProd.
  *
  * Each is a typed `Aggregator` wrapped with `functions.udaf`, usable both
  * in `groupBy().agg()` and as a window function. Over a running frame
  * (`ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW`) Spark's
  * UnboundedPrecedingWindowFunctionFrame feeds rows incrementally, so a
  * cumulative product is O(n) per partition — no per-row array
  * materialization, unlike a collect_list fold.
  */
object Udafs {

  /** Running product of doubles (nulls ignored, like SQL aggregates).
    * Multiplication happens in frame order, so results are bit-identical
    * to a sequential fold (and to DuckDB's `product()` window).
    */
  private val productAgg: Aggregator[java.lang.Double, Double, Double] =
    new Aggregator[java.lang.Double, Double, Double] {
      def zero: Double = 1.0
      def reduce(acc: Double, x: java.lang.Double): Double =
        if (x == null) acc else acc * x
      def merge(a: Double, b: Double): Double = a * b
      def finish(acc: Double): Double = acc
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  private val productUdaf = udaf(productAgg)

  def product(c: Column): Column = productUdaf(c)

  /** Geometric mean — a reduction the built-in surface lacks, mirroring
    * the reference's user-defined `Aggregation` example shape.
    * exp(mean(ln x)) for strictly-positive inputs.
    */
  private val geoMeanAgg: Aggregator[java.lang.Double, (Double, Long), Double] =
    new Aggregator[java.lang.Double, (Double, Long), Double] {
      def zero: (Double, Long) = (0.0, 0L)
      def reduce(acc: (Double, Long), x: java.lang.Double): (Double, Long) =
        if (x == null) acc else (acc._1 + math.log(x), acc._2 + 1)
      def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
        (a._1 + b._1, a._2 + b._2)
      def finish(acc: (Double, Long)): Double =
        if (acc._2 == 0) Double.NaN else math.exp(acc._1 / acc._2)
      def bufferEncoder: Encoder[(Double, Long)] =
        Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  private val geoMeanUdaf = udaf(geoMeanAgg)

  def geoMean(c: Column): Column = geoMeanUdaf(c)
}
