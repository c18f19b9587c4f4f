package graft

import org.apache.spark.sql.SparkSession

/** Benchmark harness. Runs every registered query against
  * SPARK_GRAFT_SF_DIR, materializing results through the noop sink so
  * the full plan executes (a bare count() lets Catalyst prune all
  * projections and would time scan+count instead of the query).
  *
  * Protocol: one untimed warm-up pass over a trio of shape-diverse
  * queries (scan+agg, join, window) to absorb JVM/codegen/classloading
  * cost, then each query timed once in registration order. Failures
  * propagate — a broken query must fail the bench, not record -1s.
  *
  * Prints ONE JSON line: {"metric":"total","value":N,"unit":"sec",
  * "queries":{...},"sf":...}.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    // Warm-up (untimed): JIT, codegen cache, parquet footer reads.
    Seq("q1_pricing_summary", "q_join_inner", "q_cumulative")
      .filter(SparkEntry.queries.contains).foreach(runOnce)

    val results = SparkEntry.queries.keys.toSeq.map { name =>
      val t0 = System.nanoTime()
      runOnce(name)
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
