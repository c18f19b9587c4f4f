package graft

import org.apache.spark.sql.functions._
import graft.functions.{BigramPairCounts, GraftFunctions, ShingleMinHashes}
import graft.operators.TextDedup

/** Native text kernels: bit-equality against the interpreted SQL
  * formulations they replaced, on the real corpus plus hand edges.
  */
class TextKernelsSpec extends SparkSpec {

  test("shingle_min_hashes equals the SQL md5+affine-min fold on the corpus") {
    GraftFunctions.register(spark)
    val n = 3; val k = 16
    val docs = Tables.documents(spark, sfDir)
      .filter(size(split(col("text"), " ")) >= n)
    val consts = TextDedup.mixConsts(k)
    val wsa = col("__ws")
    val sqlHashes = transform(sequence(lit(0), size(wsa) - n),
      i => conv(substring(md5(
        concat_ws(" ", (0 until n).map(j => element_at(wsa, i + j + 1)): _*)),
        1, 7), 16, 10).cast("long"))
    val sqlMins = array(consts.map { case (a, b) =>
      array_min(transform(col("__sh"), h => (h * a + b) % TextDedup.P)) }: _*)
    val mismatches = docs
      .select(col("doc_id"), col("text"), split(col("text"), " ").as("__ws"))
      .select(col("doc_id"), col("text"), sqlHashes.as("__sh"))
      .select(col("doc_id"),
        sqlMins.as("expected"),
        ShingleMinHashes(col("text"), n, k).as("got"))
      .filter(col("expected") =!= col("got"))
      .count()
    assert(mismatches == 0)
  }

  test("shingle_min_hashes edge cases: short, empty, multi-space, unicode") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // "a  b" splits to ["a", "", "b"] (limit -1 keeps empties) — 3 words
    val rows = Seq("", "one two", "a  b", "über σtring <3 !").toDF("text")
      .select(col("text"), ShingleMinHashes(col("text"), 3, 4).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(rows("").isEmpty && rows("one two").isEmpty)
    assert(rows("a  b").length == 4 && rows("über σtring <3 !").length == 4)
    // one-shingle doc: mins are exactly the affine mixes of that shingle
    val h0 = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest("a  b".getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
        .take(7), 16)
    val expected = TextDedup.mixConsts(4).map { case (a, b) => (h0 * a + b) % TextDedup.P }
    assert(rows("a  b") == expected)
  }

  test("shingle_hashes equals the SQL md5 projection; dedup preserves the set") {
    GraftFunctions.register(spark)
    val n = 3
    val docs = Tables.documents(spark, sfDir)
    val expected = TextDedup.shingles(docs, "doc_id", "text", n, distinct = false)
      .select(col("doc_id"),
        conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long").as("h"))
    val raw = docs.select(col("doc_id"),
      explode(graft.functions.ShingleHashes(col("text"), n, 15, dedup = false)).as("h"))
    assert(raw.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(raw).count() == 0)
    // dedup=true: same distinct set, no within-doc duplicates
    val deduped = docs.select(col("doc_id"),
      explode(graft.functions.ShingleHashes(col("text"), n, 15, dedup = true)).as("h"))
    assert(deduped.count() == deduped.distinct().count())
    assert(deduped.distinct().exceptAll(raw.distinct()).count() == 0)
    assert(raw.distinct().exceptAll(deduped.distinct()).count() == 0)
    // 7-hex variant matches baseHash (the 28-bit minhash base)
    val base7 = TextDedup.shingles(docs, "doc_id", "text", n, distinct = false)
      .select(col("doc_id"), TextDedup.baseHash(col("sh")).as("h"))
    val got7 = docs.select(col("doc_id"),
      explode(graft.functions.ShingleHashes(col("text"), n, 7, dedup = false)).as("h"))
    assert(got7.exceptAll(base7).count() == 0 && base7.exceptAll(got7).count() == 0)
  }

  test("sim_hash equals the SQL explode + bit-vote fold on the corpus") {
    GraftFunctions.register(spark)
    val bits = 16
    val docs = Tables.documents(spark, sfDir)
    val tokens = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .withColumn("h", conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long"))
    val bitSums = (0 until bits).map(j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j"))
    val packed = (0 until bits).map(j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    val expected = tokens.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), packed.as("expected"))
    val mismatches = docs
      .select(col("doc_id"), graft.functions.SimHash(col("text"), bits).as("got"))
      .join(expected, "doc_id")
      .filter(col("got") =!= col("expected")).count()
    assert(mismatches == 0)
  }

  test("bigram_pair_counts equals the SQL explode+groupBy on the corpus") {
    GraftFunctions.register(spark)
    val wsa = col("__ws")
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("__ws"))
      .select(col("doc_id"), explode(when(size(wsa) >= 2,
        transform(sequence(lit(1), size(wsa) - 1),
          i => struct(element_at(wsa, i).as("w1"), element_at(wsa, i + 1).as("w2"))))).as("b"))
      .groupBy(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("cnt"))
    val got = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(BigramPairCounts(col("text"))).as("b"))
      .select(col("doc_id"), col("b.w1"), col("b.w2"), col("b.cnt"))
    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)
  }

  test("bigram_pair_counts edge cases") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = Seq("", "solo", "a b a b a").toDF("text")
      .select(col("text"), BigramPairCounts(col("text")).as("b"))
      .collect().map(r => r.getString(0) -> r.getSeq[org.apache.spark.sql.Row](1)).toMap
    assert(out("").isEmpty && out("solo").isEmpty)
    // "a b a b a": (a,b)x2, (b,a)x2 — counted in-kernel, insertion order
    assert(out("a b a b a").map(r => (r.getString(0), r.getString(1), r.getLong(2))) ==
      Seq(("a", "b", 2L), ("b", "a", 2L)))
  }
}
