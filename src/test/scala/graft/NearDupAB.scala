package graft

import org.apache.spark.sql.SparkSession

/** Minimal isolated timer for TextDedup.nearDuplicates (dev loop). */
object NearDupAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 9
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ts = (1 to reps).map { _ =>
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = graft.operators.TextDedup
        .nearDuplicates(Tables.documents(spark, sfDir), "doc_id", "text", 3, 16, 4, 0.8)
        .orderBy("doc_a", "doc_b").collect().length
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[ab] $dt%.3f s  pairs=$n")
      dt
    }.sorted
    println(f"[ab] median=${ts(ts.size / 2)}%.3f min=${ts.head}%.3f")
    spark.stop()
  }
}
