package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop stage profiler for TextDedup.nearDuplicates — times each
  * pipeline stage in isolation (not shipped; run via Test/runMain). */
object NearDupProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextDedup

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    (1 to 3).foreach { rep =>
      println(s"=== rep $rep ===")
      spark.sharedState.cacheManager.clearCache()
      val docs = Tables.documents(spark, sfDir)
      val t0 = System.nanoTime()
      // mirror of nearDuplicates' window regime, stage by stage
      import org.apache.spark.sql.expressions.Window
      val small = graft.operators.Tuning.isSmall(docs)
      println(s"[prof] isSmall=$small")
      graft.operators.Tuning.scoped(spark, small) {
        val wRep = Window.partitionBy("__th")
        val tagged = docs.select(col("doc_id"), col("text"))
          .withColumn("__th", md5(col("text")))
          .withColumn("__rep", min(col("doc_id")).over(wRep))
          .withColumn("__csz", count(lit(1)).over(wRep))
          .cache()
        val reps = tagged.filter(col("doc_id") === col("__rep"))
          .select(col("doc_id"), col("text"))
        time("tagged materialize")(tagged.count())
        val sig = TextDedup.bandSignaturesProjected(
          reps, "doc_id", "text", 3, 16, 4).cache()
        time("signatures")(sig.count())
        val cand = TextDedup.candidatePairs(sig, "doc_id").cache()
        time("candidates")(cand.count())
        val candDocs = cand.select(col("doc_a").as("doc_id"))
          .union(cand.select(col("doc_b").as("doc_id")))
        val candHashes = reps.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
          .select(col("doc_id"), graft.functions.ShingleHashes(
            col("text"), 3, 7, dedup = true).as("__hs"))
          .cache()
        time("candidate hashes")(candHashes.count())
        val repPairs = broadcast(cand)
          .join(candHashes.select(col("doc_id").as("doc_a"), col("__hs").as("__ha")), "doc_a")
          .join(broadcast(
            candHashes.select(col("doc_id").as("doc_b"), col("__hs").as("__hb"))), "doc_b")
          .withColumn("__ni", size(array_intersect(col("__ha"), col("__hb"))))
          .select(col("doc_a"), col("doc_b"),
            (col("__ni") / (size(col("__ha")) + size(col("__hb")) - col("__ni")))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.8)
          .cache()
        time("jaccard verify")(repPairs.count())
        val nDup = time("nDup agg")(
          tagged.agg(count(when(col("__csz") > 1, lit(1)))).head().getLong(0))
        println(s"[prof] nDup=$nDup")
        val full = time("full operator end-to-end")(
          TextDedup.nearDuplicates(docs, "doc_id", "text", 3, 16, 4, 0.8)
            .orderBy("doc_a", "doc_b").collect().length)
        println(f"[prof] total mirrored ${(System.nanoTime() - t0) / 1e9}%.3f s, pairs=$full")
        tagged.unpersist(blocking = false)
        sig.unpersist(blocking = false)
        cand.unpersist(blocking = false)
        candHashes.unpersist(blocking = false)
        repPairs.unpersist(blocking = false)
      }
    }
    spark.stop()
  }
}
