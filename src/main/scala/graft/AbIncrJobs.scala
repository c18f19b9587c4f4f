package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextDedup}

// Scratch measurement probe (guide §1.1): per-PHASE Spark job/stage
// counts inside hygieneFunnelAgainstIndex, by replaying its statement
// sequence with a listener mark between pins. The funnel schedules 45
// jobs at r20 start (AbPlan) — this attributes them, so the job-count
// work on q_incremental_funnel targets the phases that actually pay.
// The body below mirrors TextDedup.hygieneFunnelAgainstIndex at the
// default parameters the query uses; it is measurement scaffolding,
// never a query path (drift only misattributes counts, never results).
object AbIncrJobs {
  def main(args: Array[String]): Unit = {
    val path = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1/documents.parquet"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .appName("abij").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val jobEnds = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobEnds.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    def drain(): Unit = {
      val limit = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (jobEnds.get < jobs.get && System.nanoTime() < limit) Thread.sleep(20)
    }
    var t0 = System.nanoTime()
    def mark(name: String): Unit = {
      drain()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  $name%-18s jobs=${jobs.get}%3d stages=${stages.get}%3d tasks=${tasks.get}%5d  ${dt}%5.2f s")
      jobs.set(0); jobEnds.set(0); stages.set(0); tasks.set(0)
      t0 = System.nanoTime()
    }

    val docs = spark.read.parquet(path).select(col("doc_id"), col("source"), col("text"))
    val old = docs.filter(col("doc_id") % 10 < 8)
    val fpIndex = TextDedup.winnowFingerprints(old, "doc_id", "text", k = 3, w = 4)
      .select(col("doc_id").as("idx_id"), col("fp"))
    val winIndex = TextDedup.windowHashIndex(old, "text", windowWords = 4)
    val batch0 = docs.filter(col("doc_id") % 10 >= 8)
    val (idCol, sourceCol, textCol) = ("doc_id", "source", "text")
    val (k, w, minShared, maxPostings) = (3, 4, 3L, 3L)
    val windows = Seq((4, 5L), (8, 2L))

    def run(): Unit = {
      // ---- replayed funnel body (see TextDedup.hygieneFunnelAgainstIndex)
      val nFiles = batch0.inputFiles.length
      val batch0s =
        if (nFiles > 0 && nFiles < spark.sparkContext.defaultParallelism)
          batch0.repartition(spark.sparkContext.defaultParallelism)
        else batch0
      val batch = batch0s.select(col(idCol), col(sourceCol), col(textCol))
      val splitTok = size(split(col(textCol), " ")).cast("long")
      val rows0 = batch.select(col(idCol), unhex(md5(col(textCol))).as("__eh"),
          splitTok.as("__tok"),
          conv(substring(md5(concat(col(idCol).cast("string"), lit("|"),
            col(textCol))), 1, 15), 16, 10).cast("long").as("__th"))
        .localCheckpoint(false)
      mark("rows0 pin")
      val dupKeeps = rows0.groupBy(col("__eh"))
        .agg(min(col(idCol)).as("__keepId"), count(lit(1)).as("__n"))
        .filter(col("__n") > 1)
        .select(col("__eh"), col("__keepId"))
      val dropIds = rows0.join(dupKeeps, Seq("__eh"))
        .filter(col(idCol) =!= col("__keepId"))
        .select(col(idCol))
        .localCheckpoint(false)
      mark("dropIds pin")
      val s1 = batch.join(dropIds, Seq(idCol), "left_anti").localCheckpoint(false)
      mark("s1 pin")
      val idxHits = TextDedup.winnowAgainstIndex(s1, fpIndex, idCol, textCol,
          k = k, w = w, minShared = minShared)
        .select(col("new_id").as(idCol)).distinct()
        .localCheckpoint(false)
      mark("idxHits pin")
      val s2 = s1.join(idxHits, Seq(idCol), "left_anti").localCheckpoint(false)
      mark("s2 pin")
      val ipurged = TextDedup.purgeAgainstIndex(s2, winIndex, idCol, textCol,
        windowWords = 4)
      val s3 = ipurged
        .join(s2.select(col(idCol), col(sourceCol)), Seq(idCol))
        .select(col(idCol), col(sourceCol),
          (col("n_words") - col("n_removed")).as("nt2"),
          col("text_clean").as(textCol))
        .withColumn("__tok3", splitTok)
        .withColumn("__th3", conv(substring(md5(concat(col(idCol).cast("string"),
          lit("|"), col(textCol))), 1, 15), 16, 10).cast("long"))
        .localCheckpoint(false)
      mark("s3 pin (ipurge)")
      val pairs = TextDedup.winnowOverlap(s3.select(col(idCol), col(sourceCol),
          col(textCol)), idCol, textCol,
        k = k, w = w, minShared = minShared, maxPostings = maxPostings)
      val dropB = pairs.select(col("doc_b").as(idCol)).distinct()
        .localCheckpoint(false)
      mark("dropB pin")
      val s4 = s3.join(dropB, Seq(idCol), "left_anti").localCheckpoint(false)
      mark("s4 pin")
      val purged = TextDedup.purgeDuplicateSubstringsMulti(
        s4.select(col(idCol), col(textCol)), idCol, textCol,
        windows = windows, keepFirst = true)
      val s5 = purged
        .select(col(idCol), (col("n_words") - col("n_removed")).as("nt"),
          conv(substring(md5(concat(col(idCol).cast("string"), lit("|"),
            col("text_clean"))), 1, 15), 16, 10).cast("long").as("__th"))
        .join(s4.select(col(idCol), col(sourceCol)), Seq(idCol))
        .localCheckpoint(false)
      mark("s5 pin (purge)")
      val s6 = Similarity.topKPerQuery(
        s5.select(col(sourceCol), col(idCol), col("nt"), col("__th")),
        15, "nt", scoreDesc = true, idCol = idCol,
        queryCol = sourceCol, payloadCols = Seq("__th"))
      s6.write.format("noop").mode("overwrite").save()
      mark("s6+report noop")
      Pins.sweep(spark)
      mark("pin sweep")
    }
    println("warm-up:"); run()
    println("measured:"); run()
    spark.stop()
  }
}
