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
      // r18: exact-dup stage 0 (keep-first), mirroring the shipped
      // composition — (md5, id) pairs shuffle, docs anti-join the drop set
      val ehPairs = docs.select(md5(col(textCol)).as("__eh"), col(idCol))
      val dupKeeps = ehPairs.groupBy(col("__eh"))
        .agg(min(col(idCol)).as("__keepId"), count(lit(1)).as("__n"))
        .filter(col("__n") > 1).select(col("__eh"), col("__keepId"))
      val dropIds = ehPairs.join(dupKeeps, Seq("__eh"))
        .filter(col(idCol) =!= col("__keepId")).select(col(idCol))
      val s1 = docs.join(dropIds, Seq(idCol), "left_anti")
        .localCheckpoint(false)
      noop(s1)
      t = mark("exact+s1", t)
      val pairs = TextDedup.winnowOverlap(s1, idCol, textCol,
        k = k, w = w, minShared = minShared, maxPostings = maxPostings)
      val dropB = pairs.select(col("doc_b").as(idCol)).distinct()
      val s2 = s1.join(dropB, Seq(idCol), "left_anti")
        .localCheckpoint(false)
      noop(s2)
      t = mark("winnow+s2", t)
      val purged = TextDedup.purgeDuplicateSubstringsMulti(s2,
        idCol, textCol, windows = windows, keepFirst = true)
      noop(purged)
      t = mark("purge", t)
      val s3 = purged
        .select(col(idCol), (col("n_words") - col("n_removed")).as("nt"),
          col("text_clean"))
        .join(s2.select(col(idCol), col(sourceCol)), Seq(idCol))
        .localCheckpoint(false)
      noop(s3)
      t = mark("s3join", t)
      val s4 = TextExtract.capPerDomain(
          s3.select(col(idCol), col(sourceCol), col("nt")),
          idCol, sourceCol, "nt", cap = domainCap)
        .join(s3.select(col(idCol), col("text_clean")), Seq(idCol))
      noop(s4)
      t = mark("domaincap", t)
      def h60(id: org.apache.spark.sql.Column,
          text: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(id.cast("string"), lit("|"), text)),
          1, 15), 16, 10).cast("long")
      def stage(name: String, d: DataFrame,
          tok: org.apache.spark.sql.Column,
          text: org.apache.spark.sql.Column): DataFrame =
        d.withColumn("__th", h60(col(idCol), text))
          .agg(count(lit(1)).as("n_docs"), sum(tok).as("n_tokens"),
            expr("bit_xor(__th)").as("text_h"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"),
            col("text_h"))
      val splitTok = size(split(col(textCol), " ")).cast("long")
      val rep = stage("s0_raw", docs, splitTok, col(textCol))
        .unionByName(stage("s1_exact", s1, splitTok, col(textCol)))
        .unionByName(stage("s2_neardup", s2, splitTok, col(textCol)))
        .unionByName(stage("s3_purged", s3, col("nt"), col("text_clean")))
        .unionByName(stage("s4_domain_capped", s4, col("nt"),
          col("text_clean")))
        .orderBy("stage")
      noop(rep)
      t = mark("report", t)
      Pins.sweep(spark)
    }
    // r17 composition (no exact stage, 3-col report) vs the shipped
    // r18 funnel — the task-7 A/B: on exact-dup beds s1 collapses the
    // clouds before winnow/purge pay for them
    def runOld(): Double = {
      val t0 = System.nanoTime()
      val docs = docs0.select(col(idCol), col(sourceCol), col(textCol))
      val pairs = TextDedup.winnowOverlap(docs, idCol, textCol,
        k = k, w = w, minShared = minShared, maxPostings = maxPostings)
      val dropB = pairs.select(col("doc_b").as(idCol)).distinct()
      val s1 = docs.join(dropB, Seq(idCol), "left_anti")
        .localCheckpoint(false)
      val purged = TextDedup.purgeDuplicateSubstringsMulti(s1,
        idCol, textCol, windows = windows, keepFirst = true)
      val s2 = purged
        .select(col(idCol), (col("n_words") - col("n_removed")).as("nt"))
        .join(s1.select(col(idCol), col(sourceCol)), Seq(idCol))
        .localCheckpoint(false)
      val s3 = TextExtract.capPerDomain(s2, idCol, sourceCol, "nt",
        cap = domainCap)
      def st(name: String, d: DataFrame,
          tok: org.apache.spark.sql.Column): DataFrame =
        d.agg(count(lit(1)).as("n_docs"), sum(tok).as("n_tokens"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))
      noop(st("s0_raw", docs, size(split(col(textCol), " ")).cast("long"))
        .unionByName(st("s1_neardup", s1,
          size(split(col(textCol), " ")).cast("long")))
        .unionByName(st("s2_purged", s2, col("nt")))
        .unionByName(st("s3_domain_capped", s3, col("nt")))
        .orderBy("stage"))
      Pins.sweep(spark)
      (System.nanoTime() - t0) / 1e9
    }
    def runNew(): Double = {
      val t0 = System.nanoTime()
      noop(TextDedup.hygieneFunnel(docs0, idCol, sourceCol, textCol,
        k = k, w = w, minShared = minShared, maxPostings = maxPostings,
        windows = windows, domainCap = domainCap))
      Pins.sweep(spark)
      (System.nanoTime() - t0) / 1e9
    }
    // decomposed probe of the r19 shipped shape (fact pin + fused
    // exact/report aggregate + single tagged report job)
    def runNewV(): Unit = {
      def h60(id: org.apache.spark.sql.Column,
          text: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(id.cast("string"), lit("|"), text)),
          1, 15), 16, 10).cast("long")
      def mark(name: String, t0: Long): Long = {
        val t = System.nanoTime()
        println(f"  $name%-14s ${(t - t0) / 1e9}%6.2f")
        t
      }
      var t = System.nanoTime()
      val docs = docs0.select(col(idCol), col(sourceCol), col(textCol))
      val splitTok = size(split(col(textCol), " ")).cast("long")
      val rows0 = docs.select(col(idCol), unhex(md5(col(textCol))).as("__eh"),
          splitTok.as("__tok"), h60(col(idCol), col(textCol)).as("__th"))
        .localCheckpoint(false)
      noop(rows0)
      t = mark("facts", t)
      val dupKeeps = rows0.groupBy(col("__eh"))
        .agg(min(col(idCol)).as("__keepId"), count(lit(1)).as("__n"))
        .filter(col("__n") > 1).select(col("__eh"), col("__keepId"))
      val dropIds = rows0.join(dupKeeps, Seq("__eh"))
        .filter(col(idCol) =!= col("__keepId")).select(col(idCol))
        .localCheckpoint(false)
      val s1 = docs.join(dropIds, Seq(idCol), "left_anti")
        .localCheckpoint(false)
      noop(s1)
      t = mark("dedup+s1", t)
      val pairs = TextDedup.winnowOverlap(s1, idCol, textCol,
        k = k, w = w, minShared = minShared, maxPostings = maxPostings)
      val dropB = pairs.select(col("doc_b").as(idCol)).distinct()
        .localCheckpoint(false)
      val s2 = s1.join(dropB, Seq(idCol), "left_anti")
        .localCheckpoint(false)
      noop(s2)
      t = mark("winnow+s2", t)
      val purged = TextDedup.purgeDuplicateSubstringsMulti(s2,
        idCol, textCol, windows = windows, keepFirst = true)
      val s3 = purged
        .select(col(idCol), (col("n_words") - col("n_removed")).as("nt"),
          h60(col(idCol), col("text_clean")).as("__th"))
        .join(s2.select(col(idCol), col(sourceCol)), Seq(idCol))
        .localCheckpoint(false)
      noop(s3)
      t = mark("purge+s3", t)
      val s4 = TextExtract.capPerDomain(
          s3.select(col(idCol), col(sourceCol), col("nt")),
          idCol, sourceCol, "nt", cap = domainCap)
        .join(s3.select(col(idCol), col("__th")), Seq(idCol))
      def negLeg(names: Seq[String], drop: DataFrame): DataFrame =
        rows0.join(drop, Seq(idCol), "left_semi")
          .select(explode(array(names.map(lit): _*)).as("stage"),
            lit(-1L).as("__n"), (-col("__tok")).as("__tok"), col("__th"))
      def pinLeg(name: String, d: DataFrame,
          tok: org.apache.spark.sql.Column): DataFrame =
        d.select(lit(name).as("stage"), lit(1L).as("__n"),
          tok.cast("long").as("__tok"), col("__th"))
      val tagged = rows0
        .select(explode(array(lit("s0_raw"), lit("s1_exact"),
            lit("s2_neardup"))).as("stage"),
          lit(1L).as("__n"), col("__tok"), col("__th"))
        .unionByName(negLeg(Seq("s1_exact", "s2_neardup"), dropIds))
        .unionByName(negLeg(Seq("s2_neardup"), dropB))
        .unionByName(pinLeg("s3_purged", s3, col("nt")))
        .unionByName(pinLeg("s4_domain_capped", s4, col("nt")))
      import spark.implicits._
      val zeroLegs = Seq("s0_raw", "s1_exact", "s2_neardup", "s3_purged",
          "s4_domain_capped").toDF("stage")
        .select(col("stage"), lit(0L).as("__n"),
          lit(null).cast("long").as("__tok"),
          lit(null).cast("long").as("__th"))
      noop(tagged.unionByName(zeroLegs).groupBy(col("stage"))
        .agg(sum(col("__n")).as("n_docs"), sum(col("__tok")).as("n_tokens"),
          expr("bit_xor(__th)").as("text_h"))
        .coalesce(1).sortWithinPartitions("stage"))
      t = mark("report", t)
      Pins.sweep(spark)
    }
    // the r18 shipped composition verbatim (exact stage + five
    // independent per-stage report aggregates) — the r19 baseline
    def runR18(): Double = {
      val t0 = System.nanoTime()
      val docs = docs0.select(col(idCol), col(sourceCol), col(textCol))
      val ehPairs = docs.select(md5(col(textCol)).as("__eh"), col(idCol))
      val dupKeeps = ehPairs.groupBy(col("__eh"))
        .agg(min(col(idCol)).as("__keepId"), count(lit(1)).as("__n"))
        .filter(col("__n") > 1).select(col("__eh"), col("__keepId"))
      val dropIds = ehPairs.join(dupKeeps, Seq("__eh"))
        .filter(col(idCol) =!= col("__keepId")).select(col(idCol))
      val s1 = docs.join(dropIds, Seq(idCol), "left_anti")
        .localCheckpoint(false)
      val pairs = TextDedup.winnowOverlap(s1, idCol, textCol,
        k = k, w = w, minShared = minShared, maxPostings = maxPostings)
      val dropB = pairs.select(col("doc_b").as(idCol)).distinct()
      val s2 = s1.join(dropB, Seq(idCol), "left_anti")
        .localCheckpoint(false)
      val purged = TextDedup.purgeDuplicateSubstringsMulti(s2,
        idCol, textCol, windows = windows, keepFirst = true)
      val s3 = purged
        .select(col(idCol), (col("n_words") - col("n_removed")).as("nt"),
          col("text_clean"))
        .join(s2.select(col(idCol), col(sourceCol)), Seq(idCol))
        .localCheckpoint(false)
      val s4 = TextExtract.capPerDomain(
          s3.select(col(idCol), col(sourceCol), col("nt")),
          idCol, sourceCol, "nt", cap = domainCap)
        .join(s3.select(col(idCol), col("text_clean")), Seq(idCol))
      def h60(id: org.apache.spark.sql.Column,
          text: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(id.cast("string"), lit("|"), text)),
          1, 15), 16, 10).cast("long")
      def stage(name: String, d: DataFrame,
          tok: org.apache.spark.sql.Column,
          text: org.apache.spark.sql.Column): DataFrame =
        d.withColumn("__th", h60(col(idCol), text))
          .agg(count(lit(1)).as("n_docs"), sum(tok).as("n_tokens"),
            expr("bit_xor(__th)").as("text_h"))
          .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"),
            col("text_h"))
      val splitTok = size(split(col(textCol), " ")).cast("long")
      noop(stage("s0_raw", docs, splitTok, col(textCol))
        .unionByName(stage("s1_exact", s1, splitTok, col(textCol)))
        .unionByName(stage("s2_neardup", s2, splitTok, col(textCol)))
        .unionByName(stage("s3_purged", s3, col("nt"), col("text_clean")))
        .unionByName(stage("s4_domain_capped", s4, col("nt"),
          col("text_clean")))
        .orderBy("stage"))
      Pins.sweep(spark)
      (System.nanoTime() - t0) / 1e9
    }
    run(verbose = false); runOld(); runR18(); runNew() // warm-up
    val olds = collection.mutable.ArrayBuffer[Double]()
    val r18s = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { i =>
      println(s"rep $i:")
      val t0 = System.nanoTime()
      run(verbose = true)
      println(f"  TOTAL          ${(System.nanoTime() - t0) / 1e9}%6.2f")
      println("  -- r19 decomposition --")
      runNewV()
      olds += runOld(); r18s += runR18(); news += runNew()
      println(f"  OLDSHAPE       ${olds.last}%6.2f   R18 ${r18s.last}%6.2f" +
        f"   SHIPPED ${news.last}%6.2f")
    }
    def med(xs: collection.mutable.ArrayBuffer[Double]) =
      xs.sorted.apply(xs.size / 2)
    println(f"OLDSHAPE med=${med(olds)}%.2f min=${olds.min}%.2f | " +
      f"R18 med=${med(r18s)}%.2f min=${r18s.min}%.2f | " +
      f"SHIPPED med=${med(news)}%.2f min=${news.min}%.2f")
    spark.stop()
  }
}
