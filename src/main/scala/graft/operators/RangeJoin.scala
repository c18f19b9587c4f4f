package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match left points to right intervals,
  * optionally under equality keys — the "event within window" join the
  * reference cannot express and Spark would otherwise execute as a
  * nested-loop.
  *
  * Scale design: both sides bucket by a coarse unit of the point
  * domain. The left side computes one bucket per row; the right side
  * explodes each interval into the buckets it covers (intervals are
  * expected to span few buckets at a sane width). The join is then a
  * plain equi-join on (keys, bucket) refined by the exact containment
  * predicate — shuffle-partitionable, broadcast-able, AQE-skew-safe,
  * never a cartesian. Each (point, interval) pair meets in exactly one
  * bucket (the point's), so no post-join dedup is needed.
  */
object RangeJoin {

  /** @param pointCol   numeric point column on `left`
    * @param startCol   inclusive interval start on `right`
    * @param endCol     inclusive interval end on `right`
    * @param bucketWidth coarse bucket size in point units
    * @param keys       additional equality keys present on both sides
    */
  def intervalJoin(
      left: DataFrame,
      pointCol: String,
      right: DataFrame,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      keys: Seq[String] = Nil,
      joinType: String = "inner"): DataFrame = {
    val b = "__graft_bucket"
    val l = left.withColumn(b, floor(col(pointCol) / bucketWidth).cast("long"))
    val r = right.withColumn(b,
      explode(sequence(floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    l.join(r, keys :+ b, joinType)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop(b)
  }
}
