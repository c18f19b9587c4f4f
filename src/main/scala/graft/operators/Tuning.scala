package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Execution-regime selection for operators that run their own eager
  * multi-stage pipelines (dedup, quantiles, clustering).
  *
  * These operators make their own measured size decisions (candidate
  * counts, partition offsets), so on a SMALL input the generic adaptive
  * machinery only adds cost: AQE's stage-at-a-time materialization is a
  * scheduling round-trip per stage without contributing a decision, and
  * a full complement of shuffle tasks costs more to launch than to run
  * (measured ~2× wall-clock on the LSH pipeline at sf0.1). The small
  * regime therefore runs AQE-off with parallelism/4 shuffle partitions.
  * A LARGE input keeps the session exactly as configured — AQE's
  * coalescing and skew handling are the right tool at the 100 TB design
  * point. Settings are restored on exit either way.
  */
object Tuning {

  /** Is `df`'s optimizer-estimated size under ~1 GB? Unknown → large. */
  def isSmall(df: DataFrame): Boolean =
    scala.util.Try(
      df.queryExecution.optimizedPlan.stats.sizeInBytes <= (1L << 30)).getOrElse(false)

  def forSize[A](df: DataFrame)(f: => A): A = scoped(df.sparkSession, isSmall(df))(f)

  /** NOTE: the small regime temporarily mutates session-level conf; the
    * lock below serializes concurrent Tuning scopes on one session so
    * interleaved save/restore pairs can't strand a stale setting. An
    * unrelated query PLANNED by another thread during the scope would
    * still see the scoped values — callers sharing one session across
    * threads should pass their operators a dedicated session
    * (`spark.newSession()` shares the cluster, isolates conf). */
  def scoped[A](spark: SparkSession, small: Boolean)(f: => A): A = {
    if (!small) f
    else spark.synchronized {
      val aqeKey = "spark.sql.adaptive.enabled"
      val partKey = "spark.sql.shuffle.partitions"
      val prevAqe = spark.conf.get(aqeKey, "true")
      val prevPart = spark.conf.get(partKey)
      spark.conf.set(aqeKey, "false")
      spark.conf.set(partKey,
        math.max(1, spark.sparkContext.defaultParallelism / 4).toString)
      try f finally {
        spark.conf.set(aqeKey, prevAqe)
        spark.conf.set(partKey, prevPart)
      }
    }
  }

  /** Key-skew report — the measurement that decides whether a join on
    * `keyCol` needs salting ([[SkewJoin]]) or AQE's skew handling can
    * cope: one count aggregate over the key (vocabulary-sized), top
    * shares via TakeOrdered (no global window, audit-clean), everything
    * rejoined as broadcast one-row tables. Output: n_rows, n_keys,
    * top1_share, top10_share, avg_rows_per_key. */
  def skewReport(df: org.apache.spark.sql.DataFrame, keyCol: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = df.groupBy(keyCol).agg(count(lit(1)).as("__c"))
    val totals = counts.agg(sum("__c").as("n_rows"),
      count(lit(1)).as("n_keys"), max("__c").as("__top1"))
    val top10 = counts.orderBy(col("__c").desc, col(keyCol))
      .limit(10).agg(sum("__c").as("__top10"))
    totals.crossJoin(broadcast(top10))
      .select(col("n_rows"), col("n_keys"),
        (col("__top1").cast("double") / col("n_rows").cast("double"))
          .as("top1_share"),
        (col("__top10").cast("double") / col("n_rows").cast("double"))
          .as("top10_share"),
        (col("n_rows").cast("double") / col("n_keys").cast("double"))
          .as("avg_rows_per_key"))
  }

  /** Tidy null-profile over `cols` — (column, n_rows, n_nulls,
    * null_frac) rows from ONE aggregate pass (count(col) skips nulls),
    * unpivoted like corrMatrix. The completeness half of data
    * profiling beside q_histogram's distribution half. */
  def profileNulls(df: org.apache.spark.sql.DataFrame, cols: Seq[String])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(cols.nonEmpty, "profileNulls needs at least one column")
    val agged = df.agg(count(lit(1)).as("__n"),
      cols.map(c => count(col(c)).as(s"__c_$c")): _*)
    agged.select(explode(array(cols.map { c =>
        struct(lit(c).as("column"), col("__n").as("n_rows"),
          (col("__n") - col(s"__c_$c")).as("n_nulls"),
          ((col("__n") - col(s"__c_$c")).cast("double") /
            col("__n").cast("double")).as("null_frac"))
      }: _*)).as("r"))
      .select(col("r.column"), col("r.n_rows"), col("r.n_nulls"),
        col("r.null_frac"))
  }
}
