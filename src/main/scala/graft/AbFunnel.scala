package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{TextDedup, TextExtract}

// Scratch decomposition probe for the hygiene funnel (AbDecomp's
// sibling): times each composed stage with internal phase marks so the
// constants work targets the real bottleneck instead of a guess.
object AbFunnel {
  def main(args: Array[String]): Unit = {
    val path = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("abf").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs0 = spark.read.parquet(path)
      .repartition(spark.sparkContext.defaultParallelism) // entry spread, as the operator
    val idCol = "doc_id"; val sourceCol = "source"; val textCol = "text"
    val k = 3; val w = 4; val minShared = 3L; val maxPostings = 3L
    val windows = Seq((4, 5L), (8, 2L)); val domainCap = 15
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(verbose: Boolean): Unit = {
      def mark(name: String, t0: Long): Long = {
        val t = System.nanoTime()
        if (verbose) println(f"  $name%-14s ${(t - t0) / 1e9}%6.2f")
        t
      }
      var t = System.nanoTime()
      val docs = docs0.select(col(idCol), col(sourceCol), col(textCol))
      val pairs = TextDedup.winnowOverlap(docs, idCol, textCol,
        k = k, w = w, minShared = minShared, maxPostings = maxPostings)
      val dropB = pairs.select(col("doc_b").as(idCol)).distinct()
      val s1 = docs.join(dropB, Seq(idCol), "left_anti")
        .localCheckpoint(false)
      noop(s1)
      t = mark("winnow+s1", t)
      val purged = TextDedup.purgeDuplicateSubstringsMulti(s1,
        idCol, textCol, windows = windows, keepFirst = true)
      noop(purged)
      t = mark("purge", t)
      val s2 = purged
        .select(col(idCol), (col("n_words") - col("n_removed")).as("nt"))
        .join(s1.select(col(idCol), col(sourceCol)), Seq(idCol))
        .localCheckpoint(false)
      noop(s2)
      t = mark("s2join", t)
      val s3 = TextExtract.capPerDomain(s2, idCol, sourceCol, "nt",
        cap = domainCap)
      noop(s3)
      t = mark("domaincap", t)
      def stage(name: String, d: DataFrame,
          tok: org.apache.spark.sql.Column): DataFrame =
        d.agg(count(lit(1)).as("n_docs"), sum(tok).as("n_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
      val rep = stage("s0_raw", docs, size(split(col(textCol), " ")).cast("long"))
        .unionByName(stage("s1_neardup", s1,
          size(split(col(textCol), " ")).cast("long")))
        .unionByName(stage("s2_purged", s2, col("nt")))
        .unionByName(stage("s3_domain_capped", s3, col("nt")))
        .orderBy("stage")
      noop(rep)
      t = mark("report", t)
      Pins.sweep(spark)
    }
    run(verbose = false) // warm-up
    (1 to reps).foreach { i =>
      println(s"rep $i:")
      val t0 = System.nanoTime()
      run(verbose = true)
      println(f"  TOTAL          ${(System.nanoTime() - t0) / 1e9}%6.2f")
    }
    spark.stop()
  }
}
