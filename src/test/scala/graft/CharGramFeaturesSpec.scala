package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.QualityModel

/** char_gram_features: the one-pass codegen'd char-n-gram featurizer —
  * pinned BIT-EXACT against the exploded expression pipeline it
  * replaced (hashedCharFeaturesExpr: marked-gram explode + md5 fold +
  * per-(doc, bucket) aggregate), on real corpus text and adversarial
  * edge cases, and the direct kernel pin against the grouped
  * pinLabeledFeatures form.
  */
class CharGramFeaturesSpec extends SparkSpec {

  private def edgeDocs: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a"), // single 1-char word: marked "<a>", one truncated window
      (3L, ""), // no words at all
      (4L, "   "), // only empty split tokens
      (5L, "ab  cd"), // double space: empty middle token filtered
      (6L, "internationalization antidisestablishmentarianism"),
      (7L, "été café 日本語"), // multi-byte chars
      (8L, "😀ok 😀"), // non-BMP: surrogate pairs
      (9L, "same same same same same"))
      .toDF("doc_id", "text")
  }

  private def assertBitIdentical(kernel: DataFrame, expr: DataFrame): Unit = {
    def key(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        java.lang.Double.doubleToLongBits(r.getDouble(2))))
      .sortBy(t => (t._1, t._2))
    val (k, e) = (key(kernel), key(expr))
    assert(k.toSeq == e.toSeq,
      s"kernel/expr feature mismatch:\n kernel=${k.take(8).mkString(", ")}\n expr=${e.take(8).mkString(", ")}")
    assert(k.nonEmpty)
  }

  test("bit-identical to the exploded expression pipeline on edge cases (n=3)") {
    assertBitIdentical(
      QualityModel.hashedCharFeatures(edgeDocs, "doc_id", "text", 64, n = 3),
      QualityModel.hashedCharFeaturesExpr(edgeDocs, "doc_id", "text", 64, n = 3))
  }

  test("bit-identical at n=4 (truncated windows for short marked words)") {
    assertBitIdentical(
      QualityModel.hashedCharFeatures(edgeDocs, "doc_id", "text", 32, n = 4),
      QualityModel.hashedCharFeaturesExpr(edgeDocs, "doc_id", "text", 32, n = 4))
  }

  test("bit-identical on the real documents table (sf0.001)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    assertBitIdentical(
      QualityModel.hashedCharFeatures(docs, "doc_id", "text", 512, n = 3),
      QualityModel.hashedCharFeaturesExpr(docs, "doc_id", "text", 512, n = 3))
  }

  test("gramless docs yield no feature rows (kernel empty array drops on explode)") {
    val rows = QualityModel.hashedCharFeatures(
      edgeDocs.filter(col("doc_id").isin(3L, 4L)), "doc_id", "text", 16)
      .collect()
    assert(rows.isEmpty, s"expected no rows, got ${rows.mkString(", ")}")
  }

  test("pinLabeledCharFeatures == pinLabeledFeatures(hashedCharFeatures) incl. null fx") {
    val labels = edgeDocs.select(col("doc_id"),
      (col("doc_id") % 2 === 0).cast("string").as("label"))
    val direct = QualityModel.pinLabeledCharFeatures(
      edgeDocs, "doc_id", "text", labels, 64, n = 3)
    val grouped = QualityModel.pinLabeledFeatures(
      QualityModel.hashedCharFeatures(edgeDocs, "doc_id", "text", 64, n = 3),
      labels)
    def canon(df: DataFrame) = df.collect().map { r =>
      val fx = if (r.isNullAt(2)) null
      else r.getSeq[org.apache.spark.sql.Row](2)
        .map(e => (e.getLong(0), java.lang.Double.doubleToLongBits(e.getDouble(1))))
      (r.getLong(0), r.getString(1), fx)
    }.sortBy(_._1)
    val (d, g) = (canon(direct), canon(grouped))
    assert(d.toSeq == g.toSeq, s"pin mismatch:\n direct=${d.mkString("\n ")}\n grouped=${g.mkString("\n ")}")
    // the gramless docs (3, 4) must carry null fx on BOTH paths
    assert(d.filter(t => t._1 == 3L || t._1 == 4L).forall(_._3 == null))
  }

  test("kernel output arrays are sorted by bucket (the pin's sort_array contract)") {
    val arrs = edgeDocs.select(
      graft.functions.CharGramFeatures(col("text"), 3, 64).as("fx"))
      .collect().map(_.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0)))
    arrs.foreach(bs => assert(bs == bs.sorted && bs.distinct.size == bs.size,
      s"not sorted/unique: $bs"))
  }

  test("word twin: word_bag_features bit-identical to the exploded shingle_hashes pipeline") {
    for (docs <- Seq(edgeDocs,
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text")))) {
      def key(df: DataFrame) = df.collect()
        .map(r => (r.getLong(0), r.getLong(1),
          java.lang.Double.doubleToLongBits(r.getDouble(2))))
        .sortBy(t => (t._1, t._2)).toSeq
      val k = key(QualityModel.hashedFeatures(docs, "doc_id", "text", 512))
      val e = key(QualityModel.hashedFeaturesExpr(docs, "doc_id", "text", 512))
      assert(k == e, s"word kernel/expr mismatch: ${k.take(5)} vs ${e.take(5)}")
      assert(k.nonEmpty)
    }
  }

  test("word twin: pinLabeledWordFeatures == grouped pin; empty doc still has a feature") {
    val labels = edgeDocs.select(col("doc_id"),
      (col("doc_id") % 2 === 0).cast("string").as("label"))
    val direct = QualityModel.pinLabeledWordFeatures(
      edgeDocs, "doc_id", "text", labels, 64)
    val grouped = QualityModel.pinLabeledFeatures(
      QualityModel.hashedFeatures(edgeDocs, "doc_id", "text", 64), labels)
    def canon(df: DataFrame) = df.collect().map { r =>
      val fx = if (r.isNullAt(2)) null
      else r.getSeq[org.apache.spark.sql.Row](2)
        .map(e => (e.getLong(0), java.lang.Double.doubleToLongBits(e.getDouble(1))))
      (r.getLong(0), r.getString(1), fx)
    }.sortBy(_._1)
    assert(canon(direct).toSeq == canon(grouped).toSeq)
    // unlike char grams, the word path hashes EVERY split token — even
    // the empty token of an empty doc — so no doc has null fx
    assert(canon(direct).forall(_._3 != null))
  }

  test("SQL surface: char_gram_features callable after registration") {
    graft.functions.GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT char_gram_features('hello world', 3, 32) AS fx")
      .selectExpr("size(fx) AS s").head().getInt(0)
    assert(n > 0)
  }
}
