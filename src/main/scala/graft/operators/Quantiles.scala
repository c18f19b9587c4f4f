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
  def exactQuantiles(df: DataFrame, valueCol: String, fractions: Seq[Double]): Seq[Double] =
    exactQuantilesMulti(df, Seq(valueCol -> fractions))(valueCol)

  /** Exact quantiles for SEVERAL columns in ONE range-partition
    * pipeline: the columns union into a (tag, value) long-format stream
    * range-partitioned on (tag, value), so tag runs are contiguous and
    * per-tag offsets fall out of one per-(partition, tag) count. Versus
    * one pipeline per column this divides the job count (shuffle +
    * count + probe, ~4 jobs each) by the column count — same driver
    * traffic, same bounded executor memory.
    */
  def exactQuantilesMulti(df: DataFrame,
      specs: Seq[(String, Seq[Double])]): Map[String, Seq[Double]] = Tuning.forSize(df) {
    require(specs.nonEmpty, "at least one (column, fractions) spec")
    specs.foreach { case (c, fs) =>
      require(fs.nonEmpty && fs.forall(f => f >= 0.0 && f <= 1.0),
        s"fractions must be in [0,1] for $c: $fs") }
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
    val tagged = df.select(explode(array(specs.map { case (c, _) =>
        struct(lit(c).as("__t"), col(c).cast("double").as("__v")) }: _*)).as("s"))
      .select(col("s.__t").as("__t"), col("s.__v").as("__v"))
      .na.drop("any", Seq("__v"))
      .repartitionByRange(parts, col("__t"), col("__v"))
      .localCheckpoint(false)
    try {
      // Pass 1: per-(partition, tag) counts → per-tag global offsets.
      // Range partitioning on (tag, value) keeps each tag's rows
      // contiguous across the partition sequence, so scanning the
      // counts in (pid) order per tag yields that tag's value-order
      // offsets exactly as in the single-column case.
      val counts = tagged
        .groupBy(spark_partition_id().as("__pid"), col("__t"))
        .agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.getString(1), r.getInt(0), r.getLong(2)))
      val byTag = counts.groupBy(_._1)

      // For each tag: (pid, first global index in pid, count) spans,
      // then the wanted order statistics floor/ceil of p*(n-1).
      case class Probe(tag: String, g: Long, pid: Int, rank: Long)
      val targetsByTag = specs.map { case (tag, fractions) =>
        val tagCounts = byTag.getOrElse(tag,
          throw new IllegalArgumentException(
            s"exactQuantiles($tag): no non-null rows")).map(c => c._2 -> c._3).sortBy(_._1)
        val n = tagCounts.map(_._2).sum
        val spans = tagCounts.scanLeft((0, 0L, 0L)) { case ((_, off, c), (pid, cnt)) =>
          (pid, off + c, cnt)
        }.drop(1)
        val targets = fractions.map { p =>
          val pos = p * (n - 1)
          (p, math.floor(pos).toLong, math.ceil(pos).toLong, pos - math.floor(pos))
        }
        val probes = targets.flatMap(t => Seq(t._2, t._3)).distinct.map { g =>
          val (pid, off, _) = spans.find { case (_, off, c) => off <= g && g < off + c }.get
          Probe(tag, g, pid, g - off + 1)
        }
        (tag, targets, probes)
      }
      val located = targetsByTag.flatMap(_._3)
      val neededPids = located.map(_.pid).distinct

      // Pass 2 (checkpoint read): (partition, tag)-local ranks via a
      // window — groups are whole range-partition tag runs — then an
      // equi-join against the tiny broadcast lookup fetches only the
      // wanted rows. Partitions holding no wanted order statistic are
      // dropped before the window, so the exchange moves only the few
      // partitions actually probed — O(fractions) of them.
      val lookupDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          located.map(p => Row(p.tag, p.g, p.pid, p.rank)), 1),
        StructType(Seq(StructField("__t", org.apache.spark.sql.types.StringType),
          StructField("__g", LongType),
          StructField("__pid", IntegerType), StructField("__rank", LongType))))
      val w = Window.partitionBy("__pid", "__t").orderBy("__v")
      val picked = tagged.withColumn("__pid", spark_partition_id())
        .filter(col("__pid").isin(neededPids: _*))
        .withColumn("__rank", row_number().over(w).cast("long"))
        .join(broadcast(lookupDf), Seq("__t", "__pid", "__rank"))
        .select("__t", "__g", "__v")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap

      targetsByTag.map { case (tag, targets, _) =>
        tag -> targets.map { case (_, lo, hi, wgt) =>
          val a = picked((tag, lo)); val b = picked((tag, hi))
          if (lo == hi) a else a + (b - a) * wgt
        }
      }.toMap
    } finally tagged.unpersist(blocking = false)
  }

  /** Convenience: exact median. */
  def exactMedian(df: DataFrame, valueCol: String): Double =
    exactQuantiles(df, valueCol, Seq(0.5)).head

  /** Exact PER-GROUP quantiles with the same bounded-memory offset
    * machinery, tag = group value: range-partition on (group, value) so
    * each group's rows are contiguous in value order, count per
    * (partition, group), locate each group's order statistics, probe
    * with a partition-local window, interpolate on the driver.
    *
    * Regime note (the honest trade): driver traffic is
    * O(partitions × groups + groups × fractions), so this is the
    * at-scale EXACT path when groups are FEW and huge — the case where
    * Spark's `percentile`/`median` counts-map buffer (memory ∝ distinct
    * values in the largest group) dies. For MANY small groups the
    * buffered aggregate is the right plan (each buffer is bounded by
    * its group), and for many LARGE groups the mergeable t-digest
    * (q_tdigest_quantile) is the approximate answer. Same
    * interpolation formula as `percentile`/DuckDB `quantile_cont` —
    * results are bit-identical.
    *
    * Returns (groupCol, q_<frac>... ) one row per group, group order
    * unspecified.
    */
  def groupedExactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      fractions: Seq[Double]): DataFrame = Tuning.forSize(df) {
    require(fractions.nonEmpty && fractions.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions")
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val tagged = df
      .select(col(groupCol).cast("string").as("__t"), col(valueCol).cast("double").as("__v"))
      .na.drop("any", Seq("__t", "__v"))
      .repartitionByRange(parts, col("__t"), col("__v"))
      .localCheckpoint(false)
    try {
      val counts = tagged
        .groupBy(spark_partition_id().as("__pid"), col("__t"))
        .agg(count(lit(1)).as("__c"))
        .collect().map(r => (r.getString(1), r.getInt(0), r.getLong(2)))
      val byTag = counts.groupBy(_._1)
      case class Probe(tag: String, g: Long, pid: Int, rank: Long)
      val targetsByTag = byTag.toSeq.map { case (tag, tagCounts0) =>
        val tagCounts = tagCounts0.map(c => c._2 -> c._3).sortBy(_._1)
        val n = tagCounts.map(_._2).sum
        val spans = tagCounts.scanLeft((0, 0L, 0L)) { case ((_, off, c), (pid, cnt)) =>
          (pid, off + c, cnt)
        }.drop(1)
        val targets = fractions.map { p =>
          val pos = p * (n - 1)
          (p, math.floor(pos).toLong, math.ceil(pos).toLong, pos - math.floor(pos))
        }
        val probes = targets.flatMap(t => Seq(t._2, t._3)).distinct.map { g =>
          val (pid, off, _) = spans.find { case (_, off, c) => off <= g && g < off + c }.get
          Probe(tag, g, pid, g - off + 1)
        }
        (tag, targets, probes)
      }
      val located = targetsByTag.flatMap(_._3)
      val neededPids = located.map(_.pid).distinct
      val lookupDf = spark.createDataFrame(
        spark.sparkContext.parallelize(
          located.map(p => Row(p.tag, p.g, p.pid, p.rank)), 1),
        StructType(Seq(StructField("__t", org.apache.spark.sql.types.StringType),
          StructField("__g", LongType),
          StructField("__pid", IntegerType), StructField("__rank", LongType))))
      val w = Window.partitionBy("__pid", "__t").orderBy("__v")
      val picked = tagged.withColumn("__pid", spark_partition_id())
        .filter(col("__pid").isin(neededPids: _*))
        .withColumn("__rank", row_number().over(w).cast("long"))
        .join(broadcast(lookupDf), Seq("__t", "__pid", "__rank"))
        .select("__t", "__g", "__v")
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val out = targetsByTag.map { case (tag, targets, _) =>
        Row.fromSeq(tag +: targets.map { case (_, lo, hi, wgt) =>
          val a = picked((tag, lo)); val b = picked((tag, hi))
          if (lo == hi) a else a + (b - a) * wgt
        })
      }
      val schema = StructType(
        StructField(groupCol, org.apache.spark.sql.types.StringType) +:
          fractions.map(f => StructField(
            s"q_${f.toString.replace('.', '_')}",
            org.apache.spark.sql.types.DoubleType)))
      spark.createDataFrame(spark.sparkContext.parallelize(out, 1), schema)
    } finally tagged.unpersist(blocking = false)
  }
}
