package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {

  // Independent reference encoder: list-of-symbols, recompute the best
  // pair from a rank map each round via a completely different code
  // path (sliding collect + sortBy) — a differential check on
  // Bpe.encodeCount's imperative loop.
  private def refEncode(word: String, merges: Seq[(String, String)]): List[String] = {
    val ranks = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toList
    var continue = true
    while (continue && syms.length > 1) {
      val present = syms.sliding(2).collect {
        case List(a, b) if ranks.contains((a, b)) => ((a, b), ranks((a, b)))
      }.toList
      if (present.isEmpty) continue = false
      else {
        val (pa, pb) = present.minBy(_._2)._1
        val out = scala.collection.mutable.ListBuffer.empty[String]
        var rest = syms
        while (rest.nonEmpty) rest match {
          case a :: b :: tail if a == pa && b == pb => out += a + b; rest = tail
          case h :: tail => out += h; rest = tail
          case Nil =>
        }
        syms = out.toList
      }
    }
    syms
  }

  test("learner is deterministic and learns the expected first merges") {
    val m1 = Bpe.learn("aa ab aa ab aa", 4)
    val m2 = Bpe.learn("aa ab aa ab aa", 4)
    assert(m1 == m2)
    // 'a','a' occurs 3x; 'a','b' 2x → first merge (a,a)
    assert(m1.head == ("a", "a"))
    assert(m1.contains(("a", "b")))
    assert(Bpe.defaultMerges == Bpe.defaultMerges) // stable lazy val
    assert(Bpe.defaultMerges.size == 64)
  }

  test("encodeCount matches the independent reference encoder") {
    val merges = Bpe.defaultMerges
    val ranks = merges.zipWithIndex.toMap
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789"
    val words = Seq("the", "encoder", "training", "a", "12345", "zzzz") ++
      (1 to 200).map(_ => (1 to (1 + rnd.nextInt(12)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    words.foreach { w =>
      assert(Bpe.encodeCount(w, ranks) == refEncode(w, merges).length,
        s"word '$w': ${refEncode(w, merges)}")
    }
  }

  test("merge-all is left-to-right non-overlapping (the aaa case)") {
    val ranks = Map(("a", "a") -> 0)
    // "aaa" → merge first two, third stays: 2 tokens (not 1, not 3)
    assert(Bpe.encodeCount("aaa", ranks) == 2)
    assert(Bpe.encodeCount("aaaa", ranks) == 2)
    assert(Bpe.encodeCount("aaaaa", ranks) == 3)
  }

  test("tokenCount pre-tokenizes like the oracle and handles edge cases") {
    val ranks = Bpe.defaultMerges.zipWithIndex.toMap
    val memo = scala.collection.mutable.HashMap.empty[String, Int]
    assert(Bpe.tokenCount(null, ranks, memo) == 0L)
    assert(Bpe.tokenCount("", ranks, memo) == 0L)
    assert(Bpe.tokenCount("   ", ranks, memo) == 0L)
    // punctuation splits into single-char tokens; case-folds first
    val n1 = Bpe.tokenCount("The cat, the hat.", ranks, memo)
    val n2 = Bpe.tokenCount("the cat , the hat .", ranks, memo)
    assert(n1 == n2 && n1 > 0)
    // the \x01 delimiter char is excluded from pre-tokens entirely
    assert(Bpe.tokenCount("abcd", ranks, memo) ==
      Bpe.tokenCount("ab cd", ranks, memo))
  }

  test("tokenCounts DataFrame operator: per-doc counts, empty text = 0") {
    import spark.implicits._
    val df = Seq((1L, "the training corpus"), (2L, ""), (3L, "zq xv"))
      .toDF("doc_id", "text")
    val out = Bpe.tokenCounts(df, "text")
      .select("doc_id", "text", "n_tokens_bpe").orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).forall(_ >= 0))
    assert(out(1).getLong(2) == 0L)
    // the operator appends to the input row — originals pass through
    assert(out(0).getString(1) === "the training corpus")
    // unknown letters stay single chars: "zq xv" = 4 symbols unless a
    // learned merge covers them
    assert(out(2).getLong(2) >= 2L && out(2).getLong(2) <= 4L)
    // a real English sentence compresses below its character count
    val chars = "the training corpus".count(_ != ' ')
    assert(out(0).getLong(2) < chars)
  }

  test("tokenPieces: piece sequence reconciles with counts and the reference encoder") {
    import spark.implicits._
    val merges = Bpe.defaultMerges
    val ranks = merges.zipWithIndex.toMap
    val df = Seq((1L, "The training corpus, reads."), (2L, ""), (3L, "aaa bbb"))
      .toDF("doc_id", "text")
    val out = Bpe.tokenPieces(df, "text")
      .select("doc_id", "bpe_pieces").orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // pieces concatenate back to the pre-token stream (lossless modulo case/space)
    assert(out(1L).mkString == "thetrainingcorpus,reads.")
    assert(out(2L).isEmpty)
    // piece count == tokenCount for every doc
    val memo = scala.collection.mutable.HashMap.empty[String, Int]
    assert(out(1L).size.toLong ==
      Bpe.tokenCount("The training corpus, reads.", ranks, memo))
    // word-level pieces match the independent reference encoder, in order
    val expect = Seq("the", "training", "corpus", ",", "reads", ".")
      .flatMap(w => refEncode(w, merges))
    assert(out(1L) == expect)
  }

  test("fused graft_bpe_encode equals array_join(tokenPieces) + size, and null/empty behave") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, array_join, size}
    val df = Seq((1L, "The training corpus, reads."), (2L, ""),
      (3L, "aaa bbb"), (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val fused = df.select(col("doc_id"),
        graft.functions.BpeKernels.encode(col("text"), Bpe.defaultMerges, "|")
          .as("e"))
      .select(col("doc_id"), col("e.pieces_str"), col("e.n_pieces"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    val viaArray = Bpe.tokenPieces(df, "text")
      .select(col("doc_id"), array_join(col("bpe_pieces"), "|"),
        size(col("bpe_pieces")).cast("long"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getLong(2))).toMap
    for (id <- Seq(1L, 2L, 3L)) assert(fused(id) == viaArray(id), s"doc $id")
    // kernel is null-propagating (struct null for null text); the
    // tokenPieces operator coalesces to an empty sequence
    assert(fused(4L) == ((None, -1L)))
    assert(viaArray(4L) == ((Some(""), 0L)))
  }

  test("WordPiece greedy segmentation: in-vocab words, greedy longest, char fallback") {
    import spark.implicits._
    import graft.operators.WordPiece
    val vocab = Seq("the", "then", "cat", "ca", "a", "b", "c", "t", "h", "e", "x")
    val got = WordPiece.segmentCounts(
        Seq("the", "then", "cats", "xxthe", "zzz", "").toDF("word"), vocab)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got("the") == 1)    // whole word in vocab
    assert(got("then") == 1)   // greedy takes the LONGER piece, not the+n
    assert(got("cats") == 2)   // cat + s(fallback: 's' not in vocab, 1 char)
    assert(got("xxthe") == 3)  // x + x + the
    assert(got("zzz") == 3)    // pure fallback, one per char
    assert(got("") == 0)
  }

  test("WordPiece fertilityBySource: known tiny corpus") {
    import spark.implicits._
    import graft.operators.WordPiece
    // top-1 word is "aa" (3 occurrences); charset {a, b}
    val docs = Seq(
      ("s1", "aa aa b"), ("s2", "aa ab"))
      .toDF("source", "text")
    val out = WordPiece.fertilityBySource(docs, "text", "source", topWords = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // s1: words aa(1 tok) aa(1) b(1) -> 3 words, 3 tokens
    assert(out("s1") == ((3L, 3L, 1.0)))
    // s2: aa(1) ab(a+b = 2) -> 2 words, 3 tokens
    assert(out("s2") == ((2L, 3L, 1.5)))
  }
}
