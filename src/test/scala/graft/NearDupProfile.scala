package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-loop stage profiler for TextDedup.nearDuplicates — times each
  * stage of the SHIPPED fused small-regime path in isolation, then the
  * full operator (not shipped; run via Test/runMain). */
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
      // mirror of nearDuplicates' FUSED window regime, stage by stage
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
        val (numHashes, bandRows, shingleLen) = (16, 4, 3)
        val bandStructs = (0 until numHashes / bandRows).map(bi =>
          struct(lit(bi).as("band"),
            concat_ws(",", (bi * bandRows until (bi + 1) * bandRows)
              .map(i => element_at(col("__p.mins"), i + 1).cast("string")): _*).as("sig")))
        val sig = reps
          .filter(size(split(col("text"), " ")) >= shingleLen)
          .select(col("doc_id"),
            graft.functions.ShingleMinHashSet(col("text"), shingleLen, numHashes).as("__p"))
          .select(col("doc_id"), col("__p.hs").as("__hs"),
            explode(array(bandStructs: _*)).as("bs"))
          .select(col("doc_id"), col("__hs"),
            col("bs.band").as("band"), col("bs.sig").as("sig"))
        time("kernel+bands (no exchange)")(sig.select(count(lit(1))).head())
        val sized = sig.groupBy("band", "sig")
          .agg(sort_array(collect_list(struct(col("doc_id"), col("__hs")))).as("__m"))
          .filter(size(col("__m")) >= 2)
        val pairs = sized
          .select(col("__m"), posexplode(col("__m")).as(Seq("__i", "__sa")))
          .select(col("__sa")("doc_id").as("doc_a"), col("__sa")("__hs").as("__ha"),
            explode(slice(col("__m"), col("__i") + lit(2), size(col("__m")))).as("__sb"))
          .select(col("doc_a"), col("__ha"),
            col("__sb")("doc_id").as("doc_b"), col("__sb")("__hs").as("__hb"))
          .withColumn("__ni", size(array_intersect(col("__ha"), col("__hb"))))
          .select(col("doc_a"), col("doc_b"),
            (col("__ni") / (size(col("__ha")) + size(col("__hb")) - col("__ni")))
              .as("jaccard"))
          .filter(col("jaccard") >= 0.8)
          .distinct()
          .cache()
        time("bucket+expand+verify")(pairs.count())
        val probe = time("member probe collect")(
          tagged.filter(col("__csz") > 1)
            .select(col("__rep"), col("doc_id")).limit(1000).collect())
        println(s"[prof] probe rows=${probe.length}")
        tagged.unpersist(blocking = false)
        pairs.unpersist(blocking = false)
        spark.sharedState.cacheManager.clearCache()
        val full = time("full operator end-to-end")(
          TextDedup.nearDuplicates(docs, "doc_id", "text", 3, 16, 4, 0.8)
            .orderBy("doc_a", "doc_b").collect().length)
        println(f"[prof] total mirrored ${(System.nanoTime() - t0) / 1e9}%.3f s, pairs=$full")
      }
    }
    spark.stop()
  }
}
