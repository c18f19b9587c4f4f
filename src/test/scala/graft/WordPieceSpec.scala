package graft

import scala.util.Random
import org.apache.spark.sql.functions._

/** Differential pin for the `graft_wordpiece` kernel: the codegen'd
  * longest-prefix counter must be bit-identical to the retained
  * reference loop (segmentCountLocal — the exact body of the old
  * mapPartitions implementation) on arbitrary words and vocabularies.
  * Seeded, so failures reproduce. */
class WordPieceSpec extends SparkSpec {
  import graft.operators.WordPiece

  test("kernel equals the reference greedy loop on random words/vocabs") {
    import spark.implicits._
    val rnd = new Random(17)
    def word(): String =
      (0 until rnd.nextInt(13)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 1 to 30) {
      val vocab = (0 until rnd.nextInt(9)).map(_ => word())
        .filter(_.nonEmpty).distinct
      val words = (0 until 12).map(_ => word())
      val maxLen = if (vocab.isEmpty) 1 else vocab.map(_.length).max
      val want = words.map(w =>
        WordPiece.segmentCountLocal(w, vocab.toSet, maxLen))
      // tag each row so the comparison is order-independent
      val got = WordPiece.segmentCounts(
          words.zipWithIndex.map(_.swap).toDF("i", "word")
            .select(col("word"), col("i")), vocab)
        .collect().map(r => r.getString(0) -> r.getInt(1))
      // same word always gets the same count; compare multiset by word
      val wantBy = words.zip(want).groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      got.foreach { case (w, n) =>
        assert(wantBy(w) == Set(n), s"word=$w vocab=$vocab got=$n")
      }
      assert(got.length == words.length)
    }
  }

  test("kernel handles empty word, empty vocab, and overlapping pieces") {
    import spark.implicits._
    val vocab = Seq("ab", "abc", "c", "a", "b")
    val df = Seq("", "abc", "abcabc", "zzz", "cabab").toDF("word")
    val got = WordPiece.segmentCounts(df, vocab)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    // "" -> 0 pieces; "abc" -> [abc] = 1; "abcabc" -> [abc][abc] = 2;
    // "zzz" -> 3 single-char fallbacks (z not in vocab);
    // "cabab" -> [c][ab][ab] = 3
    assert(got == Map("" -> 0, "abc" -> 1, "abcabc" -> 2,
      "zzz" -> 3, "cabab" -> 3))
    val emptyVocab = WordPiece.segmentCounts(Seq("abc").toDF("word"), Nil)
      .collect().head.getInt(1)
    assert(emptyVocab == 3) // every char falls back
  }

  test("fertility report rides the kernel (no mapPartitions boundary)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val qe = WordPiece.fertilityBySource(docs, "text", "source",
      topWords = 10).queryExecution
    assert(qe.analyzed.toString.contains("graft_wordpiece"),
      "fertility does not use the kernel")
    assert(!qe.executedPlan.toString.contains("SerializeFromObject"),
      "a Row-encoder mapPartitions boundary is back in the plan")
  }
}
