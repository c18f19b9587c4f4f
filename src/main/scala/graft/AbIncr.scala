package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{TextDedup, TextExtract}

// Scratch decomposition probe for the INCREMENTAL hygiene funnel
// (AbFunnel's snapshot-N+1 sibling): times index construction and each
// composed stage of hygieneFunnelAgainstIndex with phase marks, so
// constants work on the q_incremental_funnel surface targets the real
// bottleneck.
object AbIncr {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("abi").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(path)
      .select(col("doc_id"), col("source"), col("text"))
    val old = docs.filter(col("doc_id") % 10 < 8)
    val batch = docs.filter(col("doc_id") % 10 >= 8)
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(verbose: Boolean): Double = {
      def mark(name: String, t0: Long): Long = {
        val t = System.nanoTime()
        if (verbose) println(f"  $name%-14s ${(t - t0) / 1e9}%6.2f")
        t
      }
      val tAll = System.nanoTime()
      var t = tAll
      val fpIndex = TextDedup.winnowFingerprints(old, "doc_id", "text",
          k = 3, w = 4)
        .select(col("doc_id").as("idx_id"), col("fp"))
      noop(fpIndex)
      t = mark("fpIndex", t)
      val winIndex = TextDedup.windowHashIndex(old, "text", windowWords = 4)
      noop(winIndex)
      t = mark("winIndex", t)
      noop(TextDedup.hygieneFunnelAgainstIndex(batch, fpIndex, winIndex,
        "doc_id", "source", "text"))
      t = mark("funnel", t)
      Pins.sweep(spark)
      (System.nanoTime() - tAll) / 1e9
    }
    run(verbose = false) // warm-up
    val ts = collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { i =>
      println(s"rep $i:")
      ts += run(verbose = true)
      println(f"  TOTAL          ${ts.last}%6.2f")
    }
    println(f"TOTAL med=${ts.sorted.apply(ts.size / 2)}%.2f min=${ts.min}%.2f")
    spark.stop()
  }
}
