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
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Full untimed pass first: JIT, whole-stage-codegen compilation and
    // stage-setup costs are per-process one-offs that would not recur on
    // a long-lived cluster, so the reported figure is the steady-state
    // second pass. The cold total is still emitted for transparency.
    // Caches created inside operators (e.g. the LSH candidate set) are
    // cleared between runs: Spark's cache manager matches by logical
    // plan, so a timed run would otherwise read the warm-up's data.
    // Dev loop: SPARK_GRAFT_ONLY=q_a,q_b restricts the run (the driver
    // never sets it, so round benches always cover the full set).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    only.foreach { o =>
      val unknown = o -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(s"[bench] SPARK_GRAFT_ONLY names match nothing: ${unknown.mkString(",")}")
    }
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_.contains(n)))
    if (names.isEmpty) {
      System.err.println("[bench] filter eliminated every query — nothing to run")
      sys.exit(2)
    }
    val cold = names.map(runOnce).sum
    spark.catalog.clearCache()
    val results = names.map { name =>
      val r = name -> runOnce(name)
      spark.catalog.clearCache()
      r
    }

    // Millisecond precision keeps the one-line JSON compact: the round
    // driver captures only a bounded tail of stdout, and a full-precision
    // 133-query line overflows that window, truncating the line start and
    // making the JSON unparseable (BENCH_r03 "parsed": null).
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","cold_value":${f(cold)},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
