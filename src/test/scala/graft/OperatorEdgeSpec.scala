package graft

import java.sql.Timestamp
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{AsOfJoin, MapOverlap, Similarity, TextDedup}

/** Edge-case regression tests for the custom operators. */
class OperatorEdgeSpec extends SparkSpec {

  test("map_overlap orders sub-second timestamps correctly") {
    // 0.9 s must sort before 1.0 s: the old epoch reconstruction
    // double-counted millis and reversed them.
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      Row(Timestamp.valueOf("2024-01-01 00:00:00.9"), 1.0),
      Row(Timestamp.valueOf("2024-01-01 00:00:01.0"), 2.0),
      Row(Timestamp.valueOf("2024-01-01 00:00:01.5"), 3.0),
      Row(Timestamp.valueOf("2024-01-01 00:00:02.0"), 4.0))
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("v", DoubleType)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val out = StructType(Seq(
      StructField("ts", TimestampType), StructField("ma", DoubleType)))
    val got = MapOverlap.mapOverlap(df, "ts", before = 1, after = 1, out, numPartitions = 2) {
      (block, start, end) =>
        (start until end).iterator.map { i =>
          val lo = math.max(0, i - 1); val hi = math.min(block.length - 1, i + 1)
          val vs = (lo to hi).map(j => block(j).getDouble(1))
          Row(block(i).getTimestamp(0), vs.sum / vs.size)
        }
    }.orderBy("ts").collect()
    assert(got.map(_.getDouble(1)).toSeq == Seq(1.5, 2.0, 3.0, 3.5))
  }

  test("merge_asof picks the positionally-last right row on key ties") {
    import spark.implicits._
    val left = Seq((10L, "L1")).toDF("k", "lv")
    // three right rows at the identical key: pandas matches the last one
    val right = Seq((10L, "first"), (10L, "middle"), (10L, "last")).toDF("k", "rv")
    (1 to 3).foreach { _ =>
      val got = AsOfJoin.mergeAsOf(left, right, on = "k").select("rv").collect()
      assert(got.map(_.getString(0)).toSeq == Seq("last"))
    }
    // forward direction matches the positionally-first row at the tie
    val fwd = AsOfJoin.mergeAsOf(left, right, on = "k", direction = "forward")
      .select("rv").collect()
    assert(fwd.map(_.getString(0)).toSeq == Seq("first"))
  }

  test("minhash lsh finds an exact duplicate pair and skips unrelated docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val pairs = TextDedup.nearDuplicates(docs, "doc_id", "text").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(pairs.head.getDouble(2) == 1.0)
  }

  test("interval join handles bucket-spanning intervals and exact boundaries") {
    import spark.implicits._
    val points = Seq((1L, 0L), (2L, 10L), (3L, 25L), (4L, 100L)).toDF("pid", "p")
    // interval [0,25] spans many buckets at width 10; [100,100] is a point
    val intervals = Seq((7L, 0L, 25L), (8L, 100L, 100L)).toDF("iid", "s", "e")
    val got = graft.operators.RangeJoin
      .intervalJoin(points, "p", intervals, "s", "e", bucketWidth = 10)
      .select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 7L), (2L, 7L), (3L, 7L), (4L, 8L)))
  }

  test("to_records / toLocalIterator streams rows to the driver") {
    val it = Tables.nation(spark, sfDir)
      .orderBy("n_nationkey").toLocalIterator()
    val rows = it.asScala.toSeq
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)) == rows.map(_.getInt(0)).sorted)
  }

  test("cosine of identical vectors is 1") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    assert(math.abs(df.head().getDouble(0) - 1.0) < 1e-12)
  }

  test("lsh bucket is stable across evaluations") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), Similarity.lshBucket(col("embedding"), 64, 4).as("b"))
    val a = e.orderBy("vec_id").collect().map(_.getLong(1)).toSeq
    val b = e.orderBy("vec_id").collect().map(_.getLong(1)).toSeq
    assert(a == b)
    assert(a.forall(x => x >= 0 && x < 16))
  }

  test("bigram LM scoring drops docs without bigrams; scores are partition-invariant") {
    import spark.implicits._
    import graft.operators.TextQuality
    val docs = Seq((1L, "one"), (2L, "two words"), (3L, "three word doc"))
      .toDF("doc_id", "text")
    val out = TextQuality.bigramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!out.contains(1L) && out(2L) == 1L && out(3L) == 2L)
    // same corpus through a different partitioning → identical scores
    val big = Tables.documents(spark, sfDir).limit(100)
    val a = TextQuality.bigramLmScore(big, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val b = TextQuality.bigramLmScore(big.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(a == b)
  }

  test("token budget mix: zero budget keeps nothing, huge budget keeps all") {
    import spark.implicits._
    import graft.operators.TextQuality
    val df = Seq(("s", 1L, 10L), ("s", 2L, 20L), ("t", 3L, 5L))
      .toDF("source", "doc_id", "tok")
    def kept(budget: Long): Long =
      TextQuality.tokenBudgetMix(df, "source", "doc_id", "tok", budget)
        .filter(col("keep")).count()
    assert(kept(0L) == 0 && kept(1000L) == 3)
  }

  test("groupOverlap cap drops ubiquitous grams, bounding pair fan-out") {
    import spark.implicits._
    import graft.operators.TextQuality
    // "a b c d e f g h" appears in ALL three groups (ubiquitous);
    // groups s1/s2 also share a private gram run
    val shared = "a b c d e f g h"
    val docs = Seq(
      ("s1", s"$shared p q r s t u v w x"),
      ("s2", s"$shared p q r s t u v w x"),
      ("s3", shared)).toDF("source", "text")
    val uncapped = TextQuality.groupOverlap(docs, "source", "text", 8)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(uncapped.keySet == Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    // cap 2: the one gram present in all 3 groups is dropped; the
    // s1-s2 private overlap survives, s3's only link disappears
    val capped = TextQuality.groupOverlap(docs, "source", "text", 8,
        maxGroupsPerGram = Some(2))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(capped.keySet == Set(("s1", "s2")), s"got $capped")
    assert(capped(("s1", "s2")) == uncapped(("s1", "s2")) - 1)
  }

  test("sliding chunks overlap by size-stride; short docs yield one chunk") {
    import spark.implicits._
    import graft.operators.TextQuality
    val docs = Seq((1L, "a b c d e f g h i j"), (2L, "x y")).toDF("doc_id", "text")
    val got = TextQuality.chunkDocuments(docs, "doc_id", "text", chunkSize = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    // doc 1 (10 tokens): starts 0,3,6 → ceil((10-4)/3)=2 → idx 0..2
    assert(got == Map(
      (1L, 0) -> "a b c d", (1L, 1) -> "d e f g", (1L, 2) -> "g h i j",
      (2L, 0) -> "x y"), s"got $got")
  }

  test("array_dot of empty arrays is 0.0, matching the HOF fold") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val d = Seq((Seq.empty[Double], Seq.empty[Double])).toDF("a", "b")
      .selectExpr("array_dot(a, b) AS v").head()
    assert(!d.isNullAt(0) && d.getDouble(0) == 0.0)
  }

  test("fwf: untyped read yields trimmed strings; overflow fails fast") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fwf").toString
    val df = Seq((1, "ab"), (22, "cdef")).toDF("k", "v")
    graft.sources.Io.writeFwf(df, s"$dir/ok", Seq(4, 6))
    val back = graft.sources.Io.readFwf(spark, s"$dir/ok",
      Seq(("k", 0, 4), ("v", 4, 10)))
    assert(back.schema.fields.forall(_.dataType == StringType))
    assert(back.orderBy("k").collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("1", "ab"), ("22", "cdef")))
    // a value wider than its field must error, not silently truncate
    val e = intercept[Exception] {
      graft.sources.Io.writeFwf(df, s"$dir/bad", Seq(1, 6))
    }
    assert(e.getMessage != null)
    // nulls write as the all-spaces sentinel; typed readback recovers null
    val withNull = Seq((1, Some(7)), (2, None)).toDF("k", "v")
    graft.sources.Io.writeFwf(withNull, s"$dir/nulls", Seq(4, 6))
    val typed = graft.sources.Io.readFwf(spark, s"$dir/nulls",
      Seq(("k", 0, 4), ("v", 4, 10)),
      StructType(Seq(StructField("k", IntegerType), StructField("v", IntegerType))))
    val rows = typed.orderBy("k").collect()
    assert(rows(0).getInt(1) == 7 && rows(1).isNullAt(1))
  }

  test("new curation operators tolerate empty and degenerate inputs") {
    import spark.implicits._
    val noDocs = Seq.empty[(Long, String, Long)].toDF("doc_id", "domain", "n_chars")
    assert(graft.operators.TextExtract.capPerDomain(
      noDocs, "doc_id", "domain", "n_chars", 3).count() == 0L)
    val noHosts = Seq.empty[(Long, String)].toDF("doc_id", "host")
    val bl = Seq("x.com").toDF("host")
    assert(graft.operators.TextExtract.filterBlockedHosts(
      noHosts, "doc_id", "host", bl).count() == 0L)
    // empty BLOCKLIST keeps everything
    val docs = Seq((1L, "a.com"), (2L, "b.org")).toDF("doc_id", "host")
    assert(graft.operators.TextExtract.filterBlockedHosts(
      docs, "doc_id", "host", Seq.empty[String].toDF("host")).count() == 2L)
    // empty word list flags nothing
    val txt = Seq((1L, "some text")).toDF("doc_id", "text")
    val fb = graft.operators.TextQuality.flagBlockedWords(
      txt, "doc_id", "text", Seq.empty).collect()(0)
    assert(fb.getLong(1) == 0L && !fb.getBoolean(2))
    // embeddingDiversity on an empty frame: no rows, no error
    val noVecs = Seq.empty[(Long, Int, Seq[Float])]
      .toDF("vec_id", "label", "embedding")
    assert(Similarity.embeddingDiversity(noVecs, "embedding", "label")
      .count() == 0L)
    // silhouette needs >= 2 centroids to have a runner-up; with exactly
    // 2 it is well-formed for every vector
    val two = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)), (2L, Seq(1f, 1f)))
      .toDF("vec_id", "embedding")
    val cents = graft.operators.Clustering.seedCentroids(
      two, "vec_id", "embedding", 2)
    assert(graft.operators.Clustering.silhouette(
      two, "vec_id", "embedding", cents).count() == 3L)
  }

  test("bloomPrunedJoin equals the plain join and actually prunes") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val big = (0 until 5000).map(i => (rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "payload")
    val small = Seq((3L, "x"), (7L, "y"), (500L, "z"), (999L, "w"))
      .toDF("sk", "tag")
    val got = graft.operators.SkewJoin
      .bloomPrunedJoin(big, "k", small, "sk")
      .select("k", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val want = big.join(small, col("k") === col("sk"))
      .select("k", "payload", "tag").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want)
    // the filter itself must discard nearly everything: 4 keys of 1000
    val bytes = graft.operators.SkewJoin.bloomFilterBytes(
      small, "sk", expectedItems = 100L, bits = 1L << 16)
    val kept = big.filter(
      graft.operators.SkewJoin.bloomMightContain(bytes, col("k"))).count()
    assert(kept < 100, s"bloom kept $kept of 5000 rows")
    assert(intercept[IllegalArgumentException] {
      graft.operators.SkewJoin.bloomPrunedJoin(big, "k", small, "sk",
        joinType = "left_outer")
    }.getMessage.contains("inner/left_semi"))
  }

  test("bloomPrunedJoin resolves when both sides share the key name") {
    import spark.implicits._
    val big = (0L until 100L).map(k => (k, k * 2)).toDF("k", "payload")
    val small = Seq((3L, "x"), (7L, "y")).toDF("k", "tag")
    val got = graft.operators.SkewJoin.bloomPrunedJoin(big, "k", small, "k")
      .select("payload", "tag").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((6L, "x"), (14L, "y")))
    // semi form too: only big-side columns survive
    val semi = graft.operators.SkewJoin
      .bloomPrunedJoin(big, "k", small, "k", joinType = "left_semi")
    assert(semi.columns.toSeq == Seq("k", "payload"))
    assert(semi.select("k").as[Long].collect().toSet == Set(3L, 7L))
  }

  test("betweenTime matches pandas inclusive-both and wraps overnight") {
    import spark.implicits._
    val rows = Seq(
      ("2024-01-01 09:14:59", "pre"),
      ("2024-01-01 09:15:00", "lo_edge"),
      ("2024-01-01 12:00:00", "mid"),
      ("2024-01-01 17:00:00", "hi_edge"),
      ("2024-01-01 17:00:01", "post"),
      ("2024-01-01 23:30:00", "night"),
      ("2024-01-01 04:00:00", "dawn_edge"),
      ("2024-01-01 04:00:01", "after_dawn"))
      .toDF("s", "tag").withColumn("ts", to_timestamp(col("s")))
    def tags(from: String, until: String, inc: String = "both") =
      graft.api.Frame(rows).betweenTime("ts", from, until, inc)
        .toDF.select("tag").as[String].collect().toSet
    // pandas default: inclusive on both endpoints
    assert(tags("09:15", "17:00") == Set("lo_edge", "mid", "hi_edge"))
    assert(tags("09:15", "17:00", "left") == Set("lo_edge", "mid"))
    assert(tags("09:15", "17:00", "right") == Set("mid", "hi_edge"))
    assert(tags("09:15", "17:00", "neither") == Set("mid"))
    // from > until wraps around midnight, pandas between_time style
    assert(tags("22:00", "04:00") == Set("night", "dawn_edge"))
    assert(tags("22:00", "04:00", "left") == Set("night"))
    assert(intercept[IllegalArgumentException] {
      tags("09:00", "10:00", "nope")
    }.getMessage.contains("inclusive"))
  }
}
