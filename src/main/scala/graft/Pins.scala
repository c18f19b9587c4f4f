package graft

import org.apache.spark.sql.SparkSession

/** Release contract for the operator pin layer.
  *
  * Several multi-consumer operators pin an intermediate with
  * `localCheckpoint(false)` (hygieneFunnel stage boundaries, the GD
  * iteration state in QualityModel/UnigramLm, the substring purge's
  * window stream) — the local-mode analogue of the inter-stage parquet
  * writes a production pipeline does anyway. Those checkpoint blocks
  * live in the block manager for the SESSION's lifetime:
  * `spark.catalog.clearCache()` clears the SQL cache only, so a
  * long-lived driver (a 289-query verify sweep, a bench session, a
  * notebook) accumulates corpus-sized blocks it can never reuse — the
  * measured in-sweep vs isolated gap on the sf1 funnel (31.3 vs
  * 24.1 s, r16).
  *
  * [[sweep]] is the caller-side release: between queries (i.e. after
  * the previous result is fully materialized — a pinned block is
  * UNRECOVERABLE after release, by checkpoint design) it unpersists
  * every RDD still registered with the context, covering both the
  * lazy-checkpoint pins and any `.cache()` an operator failed to
  * release. Verify and Bench call it after every query; PinsSpec
  * asserts two funnel runs leave no block-manager growth behind.
  */
object Pins {

  /** Unpersist every persistent RDD of the session's context; returns
    * how many were released. Safe only BETWEEN queries: any DataFrame
    * still holding a released checkpoint block fails on recompute. */
  def sweep(spark: SparkSession): Int = {
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.valuesIterator.foreach(_.unpersist(blocking = false))
    rdds.size
  }
}
