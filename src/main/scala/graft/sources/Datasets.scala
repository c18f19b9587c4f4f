package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic data generators (reference `datasets.py:17` timeseries).
  *
  * Deterministic: every pseudo-random value derives from md5 of the row
  * index, so the frame is identical on any engine, any partitioning,
  * any cluster size — the property that makes generated test data
  * usable in distributed CI. Built on `spark.range`, which parallelizes
  * generation across executors with no driver materialization.
  */
object Datasets {

  /** One row per second from 2000-01-01: (tick, ts, id, x) with
    * id ∈ [1000, 2000) and x ∈ [-1, 1) md5-derived.
    */
  def timeseries(spark: SparkSession, n: Long): DataFrame = {
    val epoch2000 = 946684800L
    spark.range(n).select(
      col("id").as("tick"),
      timestamp_seconds(lit(epoch2000) + col("id")).as("ts"),
      (lit(1000) + conv(substring(md5(concat(lit("id|"), col("id").cast("string"))), 1, 4), 16, 10)
        .cast("long") % 1000).as("id"),
      ((conv(substring(md5(concat(lit("x|"), col("id").cast("string"))), 1, 8), 16, 10)
        .cast("long") - lit(2147483648.0)) / lit(2147483648.0)).as("x"))
  }
}
