package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

/** Distributed exact quantiles (reference `_quantile.py:14-133`; pandas
  * `quantile(interpolation="linear")` / DuckDB `quantile_cont`).
  *
  * Spark's built-in exact `percentile`/`median` is a
  * `TypedImperativeAggregate` whose buffer holds EVERY value of the
  * column, so the final merge materializes the whole column in one task
  * — a guaranteed OOM at the 100 TB design point. This operator instead
  * computes exact quantiles with bounded memory everywhere:
  *
  *  1. range-partition the column (`repartitionByRange` — Spark samples
  *     split points, the standard scale-out sort primitive) and persist
  *     it, pinning one concrete partitioning for both passes (the range
  *     sampler is seeded per-execution, so two independent jobs could
  *     otherwise land on different bounds and desynchronize the offsets);
  *  2. count rows per partition (one tiny aggregation; O(partitions)
  *     rows to the driver);
  *  3. turn each requested fraction into its two neighboring global
  *     order statistics, locate each as (partition, local rank) via the
  *     partition offsets, and fetch just those rows with a
  *     partition-local `row_number` window (no global window, no
  *     single-partition funnel);
  *  4. linearly interpolate on the driver (`lo + (hi - lo) * w`, the
  *     same formula Spark's `percentile` and DuckDB's `quantile_cont`
  *     use, so results are bit-identical to both).
  *
  * Driver traffic is O(partitions + fractions); every executor-side
  * structure is bounded by the partition size; the persisted single
  * double column spills to disk if it outgrows memory.
  */
object Quantiles {

  /** Exact linear-interpolation quantiles of `valueCol` (nulls excluded),
    * as one driver-side Double per requested fraction.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, fractions: Seq[Double]): Seq[Double] = Tuning.forSize(df) {
    require(fractions.nonEmpty && fractions.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions")
    val spark = df.sparkSession
    // Session shuffle parallelism (which Tuning.forSize just right-sized
    // for small inputs) also drives the range-partition count.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // localCheckpoint (eager) PINS the partition layout: the range
    // sampler is seeded per-execution, so a plain persist() whose
    // partition is evicted/lost would silently recompute under freshly
    // sampled bounds and desynchronize pass-2 ranks from pass-1 offsets.
    // With the lineage cut, a lost partition fails the job instead of
    // corrupting the answer — fail-fast over silently wrong.
    // (lazy: materializes during the pass-1 count — no extra job)
    val sorted = df.select(col(valueCol).cast("double").as("__v")).na.drop("any")
      .repartitionByRange(parts, col("__v"))
      .localCheckpoint(false)
    try {
      // Pass 1: per-partition counts → global offsets.
      val counts = sorted
        .groupBy(spark_partition_id().as("__pid")).agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      val n = counts.map(_._2).sum
      require(n > 0, s"exactQuantiles($valueCol): no non-null rows")
      // (pid, first global index in pid, count)
      val spans = counts.scanLeft((0, 0L, 0L)) { case ((_, off, c), (pid, cnt)) =>
        (pid, off + c, cnt)
      }.drop(1)

      // Global 0-based order statistics needed: floor/ceil of p*(n-1).
      val targets = fractions.map { p =>
        val pos = p * (n - 1)
        (p, math.floor(pos).toLong, math.ceil(pos).toLong, pos - math.floor(pos))
      }
      val wanted = targets.flatMap(t => Seq(t._2, t._3)).distinct
      val located = wanted.map { g =>
        val (pid, off, _) = spans.find { case (_, off, c) => off <= g && g < off + c }.get
        Row(g, pid, g - off + 1)
      }
      val neededPids = located.map(_.getInt(1)).distinct

      // Pass 2 (cache read): partition-local ranks via a window keyed on
      // the partition id — groups are whole range-partitions — then an
      // equi-join against the tiny broadcast lookup fetches only the
      // wanted rows.
      val lookupDf = spark.createDataFrame(
        spark.sparkContext.parallelize(located, 1),
        StructType(Seq(StructField("__g", LongType),
          StructField("__pid", IntegerType), StructField("__rank", LongType))))
      // Partitions holding no wanted order statistic are dropped before
      // the window, so the pid-hash exchange moves only the few
      // partitions actually probed — O(fractions) of them — not the
      // whole column.
      val w = Window.partitionBy("__pid").orderBy("__v")
      val picked = sorted.withColumn("__pid", spark_partition_id())
        .filter(col("__pid").isin(neededPids: _*))
        .withColumn("__rank", row_number().over(w).cast("long"))
        .join(broadcast(lookupDf), Seq("__pid", "__rank"))
        .select("__g", "__v")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      targets.map { case (_, lo, hi, wgt) =>
        val a = picked(lo); val b = picked(hi)
        if (lo == hi) a else a + (b - a) * wgt
      }
    } finally sorted.unpersist(blocking = false)
  }

  /** Convenience: exact median. */
  def exactMedian(df: DataFrame, valueCol: String): Double =
    exactQuantiles(df, valueCol, Seq(0.5)).head
}
