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
}
