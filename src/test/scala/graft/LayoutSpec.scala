package graft

import org.apache.spark.sql.functions._
import graft.sources.{Io, Layout}

/** Write-side layout: partition pruning is visible in the plan, and
  * clustered / Z-ordered files have the narrow per-file value spans
  * that make parquet min/max skipping effective.
  */
class LayoutSpec extends SparkSpec {

  // unique dir per run: Spark's session-shared FileStatusCache can
  // serve a stale listing for a path rewritten mid-suite
  private val dir = s"/root/repo/target/io/layout_spec_${System.nanoTime}"

  test("partitioned write prunes at planning time") {
    Layout.writePartitioned(Tables.orders(spark, sfDir), s"$dir/part", "o_orderpriority")
    val read = Io.readParquet(spark, s"$dir/part")
      .filter(col("o_orderpriority") === "1-URGENT")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderpriority"),
      s"no partition filter in scan:\n${plan.take(1500)}")
    assert(read.count() ==
      Tables.orders(spark, sfDir).filter(col("o_orderpriority") === "1-URGENT").count())
  }

  /** Mean per-file span of `c` as a fraction of its global span — the
    * min/max-skipping effectiveness metric: for a uniform point filter,
    * the expected fraction of files that CANNOT be skipped. The mean
    * (not max) is the right statistic for a Z layout: a contiguous
    * curve segment that crosses a high-order bit boundary legitimately
    * has a full-width bounding box in one dimension. */
  private def meanSpanFrac(path: String, c: String): Double = {
    val df = Io.readParquet(spark, path)
      .select(col(c).cast("timestamp").cast("double").as("v"),
        input_file_name().as("f"))
    val g = df.agg(max("v") - min("v")).head.getDouble(0)
    df.groupBy("f").agg((max("v") - min("v")).as("span"))
      .agg(avg("span")).head.getDouble(0) / g
  }

  test("range-clustered files cover narrow key ranges") {
    Layout.writeClustered(Tables.orders(spark, sfDir), s"$dir/clustered",
      numFiles = 8, "o_orderdate")
    val frac = meanSpanFrac(s"$dir/clustered", "o_orderdate")
    assert(frac <= 0.25, f"clustered files span $frac%.2f of the key range on average")
  }

  test("z-ordered files are narrow on BOTH columns; plain clustering is not") {
    val li = Tables.lineitem(spark, sfDir)
    Layout.writeZOrdered(li, s"$dir/zorder", numFiles = 16, bits = 4,
      "l_orderkey", "l_partkey")
    val fo = meanSpanFrac(s"$dir/zorder", "l_orderkey")
    val fp = meanSpanFrac(s"$dir/zorder", "l_partkey")
    // files touch bounded bands of BOTH dimensions on average — the
    // property single-column clustering cannot give the second column
    assert(fo <= 0.5 && fp <= 0.5, f"z-order mean spans: orderkey $fo%.2f partkey $fp%.2f")
    Layout.writeClustered(li, s"$dir/cl1", numFiles = 16, "l_orderkey")
    val fpPlain = meanSpanFrac(s"$dir/cl1", "l_partkey")
    assert(fpPlain >= 0.85,
      f"expected near-full second-column span under single-key clustering, got $fpPlain%.2f")
    // row count is preserved by the layout shuffle
    assert(Io.readParquet(spark, s"$dir/zorder").count() == li.count())
  }

  test("bucketed tables written via Layout join with zero exchange") {
    import graft.api.Frame
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      Frame(Tables.orders(spark, sfDir)).writeBucketed("orders_lb", 4, "o_custkey")
      Frame(Tables.customer(spark, sfDir)).writeBucketed("cust_lb", 4, "c_custkey")
      // forbid broadcast so only the bucket layout can avoid the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_lb")
        .join(spark.table("cust_lb"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still exchanges:\n${plan.take(1500)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS orders_lb")
      spark.sql("DROP TABLE IF EXISTS cust_lb")
    }
  }

  test("cell-bucketed IVF index joins probe candidates without reshuffling itself") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import graft.operators.Clustering
      // the offline half of the vector-search story: corpus assigned to
      // IVF cells ONCE and written bucketed on `cell`; every later probe
      // join (batch or the streaming front door) shuffles only queries.
      val emb = Tables.embeddings(spark, sfDir)
      val cents = Clustering.seedCentroids(emb, "vec_id", "embedding", 8)
      val index = Clustering.assignCells(emb, "vec_id", "embedding", cents)
      Layout.writeBucketed(index, "ivf_idx_lb", 4, "cell")
      val queries = emb.filter(col("vec_id") < 2)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val probes = Clustering.probeCells(queries, cents, nprobe = 2)
      val joined = probes.join(spark.table("ivf_idx_lb"), Seq("cell"))
      val plan = joined.queryExecution.executedPlan.toString
      assert("Exchange".r.findAllIn(plan).length <= 1,
        s"more than the probe-side exchange:\n${plan.take(1500)}")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS ivf_idx_lb")
    }
  }

  test("bucketed near-dup index joins a fresh batch without reshuffling itself") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // yesterday's corpus → signature+hash index, bucketed on the LSH
      // bucket key (band, sig): the daily incremental-dedup join then
      // shuffles ONLY the new batch; the index never re-exchanges.
      val corpus = (0L until 200L)
        .map(i => (i, s"doc $i body ${"w" + i % 7} ${"x" + i % 11} tail common words here"))
        .toDF("doc_id", "text")
      val index = graft.streaming.StreamOps.nearDupIndex(corpus, "doc_id", "text")
      Layout.writeBucketed(index, "near_dup_idx_lb", 4, "band", "sig")
      val batch = Seq((1000L, "doc 3 body w3 x3 tail common words here"))
        .toDF("doc_id", "text")
      val batchSigs = graft.operators.TextDedup.bandSignaturesProjected(
        batch, "doc_id", "text", 3, 16, 4)
      val joined = batchSigs
        .join(spark.table("near_dup_idx_lb"), Seq("band", "sig"))
      val plan = joined.queryExecution.executedPlan.toString
      // the index side reads straight from its buckets: every Exchange
      // in the plan belongs to the (tiny) batch side
      val idxSub = plan.split("Scan parquet").find(_.contains("near_dup_idx_lb"))
      assert("Exchange".r.findAllIn(plan).length <= 1,
        s"more than the batch-side exchange:\n$plan")
      assert(joined.count() > 0)
      assert(idxSub.isDefined)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS near_dup_idx_lb")
    }
  }

  test("written hygiene indexes serve the incremental joins with zero index-side exchange") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import graft.operators.TextDedup
      // yesterday's corpus -> both hygiene indexes, written bucketed on
      // their join keys (the operational half of the incremental
      // funnel: the stored side never re-exchanges; only the batch
      // shuffles into the bucket count)
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("text"))
      val corpus = docs.filter(col("doc_id") % 10 < 8)
      Layout.writeHygieneIndexes(corpus, "doc_id", "text",
        "hyg_fp_idx_lb", "hyg_win_idx_lb", numBuckets = 4)
      val batch = docs.filter(col("doc_id") % 10 >= 8)
      // plain twins: same rows, no bucket metadata — the differential
      // that isolates what the bucketed layout saves
      spark.table("hyg_fp_idx_lb").write.mode("overwrite")
        .parquet(s"$dir/fp_plain")
      spark.table("hyg_win_idx_lb").write.mode("overwrite")
        .parquet(s"$dir/win_plain")
      def nEx(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

      val purgeB = TextDedup.purgeAgainstIndex(batch,
        spark.table("hyg_win_idx_lb"), "doc_id", "text", windowWords = 4)
      val purgeP = TextDedup.purgeAgainstIndex(batch,
        spark.read.parquet(s"$dir/win_plain"), "doc_id", "text",
        windowWords = 4)
      assert(nEx(purgeB) < nEx(purgeP),
        s"bucketed window index still exchanges: ${nEx(purgeB)} vs plain ${nEx(purgeP)}:\n" +
          purgeB.queryExecution.executedPlan.toString.take(2000))
      val winnowB = TextDedup.winnowAgainstIndex(batch,
        spark.table("hyg_fp_idx_lb"), "doc_id", "text")
      val winnowP = TextDedup.winnowAgainstIndex(batch,
        spark.read.parquet(s"$dir/fp_plain"), "doc_id", "text")
      assert(nEx(winnowB) < nEx(winnowP),
        s"bucketed fp index still exchanges: ${nEx(winnowB)} vs plain ${nEx(winnowP)}:\n" +
          winnowB.queryExecution.executedPlan.toString.take(2000))
      // layout must not change semantics: both variants bit-equal
      def purgeRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getString(3))).sortBy(_._1).toSeq
      assert(purgeRows(purgeB) == purgeRows(purgeP))
      assert(purgeRows(purgeB).size == batch.count())
      def winnowRows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(p => (p._1, p._2)).toSeq
      assert(winnowRows(winnowB) == winnowRows(winnowP))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS hyg_fp_idx_lb")
      spark.sql("DROP TABLE IF EXISTS hyg_win_idx_lb")
    }
  }

  test("two-day snapshot cycle: write, funnel against tables, append, re-audit") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import graft.operators.TextDedup
      // day 0: corpus -> stored indexes; day 1: batch cleaned AGAINST
      // the tables; refresh: day-1 batch appended; day 2: next batch
      // against the refreshed tables — the full production loop.
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("source"), col("text"))
      val day0 = docs.filter(col("doc_id") % 10 < 6)
      val day1 = docs.filter(col("doc_id") % 10 >= 6 && col("doc_id") % 10 < 8)
      val day2 = docs.filter(col("doc_id") % 10 >= 8)
      Layout.writeHygieneIndexes(day0, "doc_id", "text",
        "cyc_fp_lb", "cyc_win_lb", numBuckets = 4)
      // day-1 funnel against the TABLES == against ad-hoc index frames
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      val viaTables = rows(TextDedup.hygieneFunnelAgainstIndex(day1,
        spark.table("cyc_fp_lb"), spark.table("cyc_win_lb"),
        "doc_id", "source", "text"))
      val fpAdhoc = TextDedup.winnowFingerprints(day0, "doc_id", "text",
        k = 3, w = 4).select(col("doc_id").as("idx_id"), col("fp"))
      val winAdhoc = TextDedup.windowHashIndex(day0, "text", windowWords = 4)
      val viaAdhoc = rows(TextDedup.hygieneFunnelAgainstIndex(day1,
        fpAdhoc, winAdhoc, "doc_id", "source", "text"))
      assert(viaTables == viaAdhoc)
      // refresh: append day-1 to both indexes — TWICE: a retried
      // refresh must be a no-op (fp rows dedup by doc id, window
      // hashes by content), or n_shared counts would silently inflate
      Layout.appendHygieneIndexes(day1, "doc_id", "text",
        "cyc_fp_lb", "cyc_win_lb")
      Layout.appendHygieneIndexes(day1, "doc_id", "text",
        "cyc_fp_lb", "cyc_win_lb")
      // appended table contents == an index recomputed from day0+day1
      val wantWin = TextDedup.windowHashIndex(day0.unionByName(day1),
          "text", windowWords = 4)
        .collect().map(r => r.getAs[Array[Byte]](0).toSeq).toSet
      val gotWin = spark.table("cyc_win_lb")
        .collect().map(r => r.getAs[Array[Byte]](0).toSeq).toSet
      assert(gotWin == wantWin, s"win index drifted after append: " +
        s"${gotWin.size} vs ${wantWin.size}")
      val wantFp = TextDedup.winnowFingerprints(day0.unionByName(day1),
          "doc_id", "text", k = 3, w = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val gotFp = spark.table("cyc_fp_lb")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotFp == wantFp)
      // row counts catch what set-equality can't: a duplicated append
      assert(spark.table("cyc_fp_lb").count() == wantFp.size.toLong)
      assert(spark.table("cyc_win_lb").count() == wantWin.size.toLong)
      // day-2 joins still read the refreshed index from its buckets
      spark.table("cyc_win_lb").write.mode("overwrite")
        .parquet(s"$dir/cyc_win_plain")
      def nEx(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
      val purgeB = TextDedup.purgeAgainstIndex(day2,
        spark.table("cyc_win_lb"), "doc_id", "text", windowWords = 4)
      val purgeP = TextDedup.purgeAgainstIndex(day2,
        spark.read.parquet(s"$dir/cyc_win_plain"), "doc_id", "text",
        windowWords = 4)
      assert(nEx(purgeB) < nEx(purgeP),
        s"refreshed window index re-exchanges: ${nEx(purgeB)} vs ${nEx(purgeP)}")
      assert(purgeB.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getString(3))).sortBy(_._1).toSeq ==
        purgeP.collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getString(3))).sortBy(_._1).toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS cyc_fp_lb")
      spark.sql("DROP TABLE IF EXISTS cyc_win_lb")
    }
  }

  test("zValue interleaves bucket bits reversibly") {
    import spark.implicits._
    val df = (0 until 256).map(i => (i.toLong, (255 - i).toLong)).toDF("a", "b")
    val z = Layout.zValue(df, bits = 4, Seq("a", "b"))
    // decode: even bit positions (LSB-first) are a's bits, odd are b's
    val rows = z.select(col("a"), col("b"), col("__z")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    def abits(zv: Long) = (0 until 4).map(k => ((zv >> (2 * k)) & 1L) << k).sum
    def bbits(zv: Long) = (0 until 4).map(k => ((zv >> (2 * k + 1)) & 1L) << k).sum
    // a's decoded bucket is monotone in a and fills all 16 buckets;
    // b's decoded bucket is monotone in b (= anti-monotone in a here)
    val as = rows.map { case (_, _, zv) => abits(zv) }
    val bs = rows.map { case (_, _, zv) => bbits(zv) }
    assert(as.zip(as.tail).forall { case (x, y) => x <= y }, "a buckets not monotone")
    assert(bs.zip(bs.tail).forall { case (x, y) => x >= y }, "b buckets not anti-monotone")
    assert(as.distinct.size == 16 && bs.distinct.size == 16, "buckets not all used")
  }
}
