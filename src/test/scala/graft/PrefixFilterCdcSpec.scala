package graft

import org.apache.spark.sql.functions._
import graft.operators.TextDedup

/** Prefix-filtered set-similarity join (exact recall vs brute force)
  * and content-defined chunking (reconstruction, boundary re-alignment,
  * dedup attribution). */
class PrefixFilterCdcSpec extends SparkSpec {

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox leaps over the lazy dog"),   // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (3L, "entirely different content with no shared words at all"),
    (4L, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
    (5L, "lorem ipsum dolor sit amet consectetur adipiscing sed"),   // near-dup of 4
    (6L, "the the the the the"), // degenerate: one distinct hot token
    (7L, "short"))

  private def tokenSet(t: String): Set[String] = t.split(" ").toSet

  private def bruteJaccardPairs(t: Double): Map[(Long, Long), Double] =
    (for {
      (a, ta) <- corpus; (b, tb) <- corpus if a < b
      inter = (tokenSet(ta) intersect tokenSet(tb)).size
      j = inter.toDouble / (tokenSet(ta).size + tokenSet(tb).size - inter)
      if j >= t
    } yield (a, b) -> j).toMap

  test("prefixFilterJoin has exact recall and precision vs brute-force Jaccard") {
    import spark.implicits._
    for (t <- Seq(0.5, 0.8, 1.0)) {
      val got = TextDedup.prefixFilterJoin(
          corpus.toDF("id", "text").repartition(3), "id", "text", t)
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val want = bruteJaccardPairs(t)
      assert(got.keySet == want.keySet, s"t=$t pairs ${got.keySet} vs ${want.keySet}")
      got.foreach { case (k, j) =>
        assert(math.abs(j - want(k)) < 1e-12, s"t=$t $k: $j vs ${want(k)}") }
    }
  }

  test("prefixFilterJoin reports set sizes alongside the verified pairs") {
    import spark.implicits._
    val row = TextDedup.prefixFilterJoin(
        corpus.toDF("id", "text"), "id", "text", 0.99)
      .filter(col("id_a") === 0 && col("id_b") === 2).collect()
    assert(row.length == 1)
    assert(row(0).getAs[Long]("m_a") == tokenSet(corpus(0)._2).size)
    assert(row(0).getAs[Double]("jaccard") == 1.0)
  }

  test("cdcChunks reconstructs every document exactly, in chunk order") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val docs = (0L until 20L).map { i =>
      (i, (0 until 400).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString)
    }
    val got = TextDedup.cdcChunks(docs.toDF("id", "text"), "id", "text")
      .orderBy("id", "chunk_idx")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rows) => id -> rows.map(_.getString(2)).mkString }
    docs.foreach { case (id, text) => assert(got(id) == text, s"doc $id") }
  }

  test("cdc boundaries re-align after a prefix insertion (content-defined)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val shared = (0 until 600).map(_ => ('a' + rnd.nextInt(8)).toChar).mkString
    val prefix = (0 until 97).map(_ => ('p' + rnd.nextInt(3)).toChar).mkString
    val docs = Seq((0L, shared), (1L, prefix + shared)).toDF("id", "text")
    val chunks = TextDedup.cdcChunks(docs, "id", "text").collect()
    val a = chunks.filter(_.getLong(0) == 0L).map(_.getString(2))
    val b = chunks.filter(_.getLong(0) == 1L).map(_.getString(2)).toSet
    // every chunk of doc 0 except possibly the first (whose left
    // context changed) and the hash warm-up reappears verbatim in doc 1
    // despite every byte offset shifting by 97
    val realigned = a.drop(1).count(b.contains)
    assert(a.length >= 4, s"expected several chunks, got ${a.length}")
    assert(realigned >= a.length - 2,
      s"only $realigned of ${a.length - 1} interior chunks re-aligned")
  }

  test("cdcChunks matches the per-codepoint recurrence and respects UTF-8") {
    import spark.implicits._
    // independent reference: fold the oracle's recurrence over code
    // points, cutting where h % 32 == 0
    def refChunks(text: String): Seq[String] = {
      val cps = text.codePoints().toArray
      var h = 0L
      val cuts = scala.collection.mutable.ArrayBuffer(0)
      cps.indices.foreach { i =>
        h = (h * 2 + (cps(i).toLong * 2654435761L) % 2147483648L) % 2147483648L
        if (h % 32 == 0) cuts += i + 1
      }
      if (cuts.last != cps.length) cuts += cps.length
      cuts.sliding(2).map { case scala.collection.mutable.ArrayBuffer(a, b) =>
        new String(cps.slice(a, b), 0, b - a)
      }.toSeq
    }
    val rnd = new scala.util.Random(13)
    val uni = "héllo wörld ünïcode données éł中文 "
    val docs = (0L until 8L).map { i =>
      (i, (0 until 300).map(_ =>
        uni.charAt(rnd.nextInt(uni.length))).mkString)
    }
    val got = TextDedup.cdcChunks(docs.toDF("id", "text"), "id", "text")
      .orderBy("id", "chunk_idx").collect()
      .groupBy(_.getLong(0)).map { case (id, rs) => id -> rs.map(_.getString(2)).toSeq }
    docs.foreach { case (id, text) =>
      assert(got(id) == refChunks(text), s"doc $id chunk mismatch") }
  }

  test("cdcDedupReport: exact copies attribute fully to the earliest owner") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val t1 = (0 until 500).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    val t2 = (0 until 500).map(_ => ('g' + rnd.nextInt(6)).toChar).mkString
    val rep = TextDedup.cdcDedupReport(
        Seq((10L, t1), (20L, t1), (30L, t2)).toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val (n10, d10, f10) = rep(10L)
    assert(d10 == 0 && f10 == 0.0) // owner of everything it has
    val (n20, d20, f20) = rep(20L)
    assert(n20 == n10 && d20 == n10 && f20 == 1.0) // verbatim copy
    val (_, d30, f30) = rep(30L)
    assert(d30 == 0 && f30 == 0.0) // disjoint alphabet, no sharing
  }
}
