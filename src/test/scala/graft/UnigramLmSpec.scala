package graft

import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece/Kudo) trainer: the in-plan Viterbi folds
  * are pinned to the imperative local Viterbi, and the full distributed
  * EM to a driver-side reference replay of the same arithmetic.
  */
class UnigramLmSpec extends SparkSpec {
  import graft.operators.UnigramLm

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat ate the rat"),
      (3L, "concatenate the catalogue"),
      (4L, "rats and cats cohabitate"),
      (5L, "the theme of the theatre"))
      .toDF("doc_id", "text")
  }

  test("in-plan Viterbi folds equal the local imperative Viterbi on every distinct word") {
    val words = UnigramLm.wordTable(corpus, "text")
    val wf = words.collect().map(r => (r.getString(0), r.getLong(1)))
    // log-probs from the seed counts, as the first E-step sees them
    val cands = UnigramLm.seedCandidates(words, 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val seeds = cands.sortBy { case (p, n) => (-n, p) }.take(20)
    val vocab = (seeds ++ cands.filter(_._1.length == 1)).distinct
    val t = vocab.map(_._2).sum
    val lp = vocab.map { case (p, n) =>
      p -> BigDecimal(math.log((n + 1).toDouble / (t + vocab.size).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val planCounts = UnigramLm.viterbiCounts(words, lp, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val localCounts = wf.flatMap { case (w, f) =>
      UnigramLm.viterbiLocal(w, lp, 4).map(_ -> f)
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
    assert(planCounts == localCounts,
      s"plan=$planCounts\nlocal=$localCounts")
  }

  test("graft_viterbi kernel equals the in-plan fold formulation on the word memo") {
    val words = UnigramLm.wordTable(corpus, "text")
    val cands = UnigramLm.seedCandidates(words, 4)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val seeds = cands.sortBy { case (p, n) => (-n, p) }.take(20)
    val vocab = (seeds ++ cands.filter(_._1.length == 1)).distinct
    val t = vocab.map(_._2).sum
    val lp = vocab.map { case (p, n) =>
      p -> BigDecimal(math.log((n + 1).toDouble / (t + vocab.size).toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val kernel = UnigramLm.viterbiCounts(words, lp, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val folds = UnigramLm.viterbiCountsExpr(words, lp, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kernel == folds, s"kernel=$kernel\nfolds=$folds")
  }

  test("Viterbi ties prefer the longest piece in both implementations") {
    import spark.implicits._
    // p(ab)+p(c) == p(a)+p(bc) exactly; the rule (min start j at each
    // DP step = the LONGEST piece ending there) picks "a"+"bc" — the
    // final position's piece is maximally long. All three
    // implementations (local, in-plan fold, oracle list_max) share it.
    val lp = Map("ab" -> -1.0, "c" -> -2.0, "a" -> -1.0, "bc" -> -2.0,
      "b" -> -5.0)
    assert(UnigramLm.viterbiLocal("abc", lp, 4) == Seq("a", "bc"))
    val words = Seq(("abc", 1L)).toDF("w", "f")
    val got = UnigramLm.viterbiCounts(words, lp, 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "bc" -> 1L))
  }

  test("distributed EM equals a driver-side reference replay") {
    val model = UnigramLm.train(corpus, "text", maxLen = 4, seedSize = 20,
      iters = 2)
    // reference: same arithmetic, all on the driver
    val words = UnigramLm.wordTable(corpus, "text")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cands = words.flatMap { case (w, f) =>
      for (s <- 0 until w.length; l <- 1 to math.min(4, w.length - s))
        yield (w.substring(s, s + l), f)
    }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }.toSeq
    val seeds = cands.sortBy { case (p, n) => (-n, p) }.take(20)
    val vocab = (seeds ++ cands.filter(_._1.length == 1)).distinct
      .sortBy { case (p, n) => (-n, p) }
    val v = vocab.size
    def lpOf(c: Map[String, Long]): Map[String, Double] = {
      val t = vocab.map { case (p, _) => c.getOrElse(p, 0L) }.sum
      vocab.map { case (p, _) =>
        p -> BigDecimal(math.log((c.getOrElse(p, 0L) + 1).toDouble /
          (t + v).toDouble)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }.toMap
    }
    var counts: Map[String, Long] = vocab.toMap
    for (_ <- 0 until 2) {
      val seg = words.flatMap { case (w, f) =>
        UnigramLm.viterbiLocal(w, lpOf(counts), 4).map(_ -> f)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      counts = vocab.map { case (p, _) => p -> seg.getOrElse(p, 0L) }.toMap
    }
    assert(model.pieces.toMap == counts,
      s"engine=${model.pieces.toMap}\nreference=$counts")
    assert(model.pieces.map(_._1) ==
      vocab.map(_._1), "vocabulary order must be (count desc, piece)")
  }

  test("pruning keeps the pruneTo best pieces plus all chars, per round") {
    val pruned = UnigramLm.train(corpus, "text", maxLen = 4, seedSize = 30,
      iters = 2, pruneTo = 8)
    val full = UnigramLm.train(corpus, "text", maxLen = 4, seedSize = 30,
      iters = 2)
    val chars = full.pieces.map(_._1).filter(_.length == 1).toSet
    val prunedSet = pruned.pieces.map(_._1).toSet
    // coverage floor: every single char survives both pruning rounds
    assert(chars.subsetOf(prunedSet), s"chars dropped: ${chars -- prunedSet}")
    // size: at most pruneTo multi-char pieces beyond the char floor
    assert(prunedSet.count(_.length > 1) <= 8)
    assert(prunedSet.size < full.pieces.size, "pruning did not shrink vocab")
    // driver reference replay of the pruned EM (same arithmetic)
    val words = UnigramLm.wordTable(corpus, "text")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val cands = words.flatMap { case (w, f) =>
      for (s <- 0 until w.length; l <- 1 to math.min(4, w.length - s))
        yield (w.substring(s, s + l), f)
    }.groupBy(_._1).map { case (p, xs) => (p, xs.map(_._2).sum) }.toSeq
    val seeds = cands.sortBy { case (p, n) => (-n, p) }.take(30)
    val vocab0 = (seeds ++ cands.filter(_._1.length == 1)).distinct
      .sortBy { case (p, n) => (-n, p) }
    var vocab = vocab0.map(_._1)
    var counts = vocab0.toMap
    def lpOf(): Map[String, Double] = {
      val t = vocab.map(counts.getOrElse(_, 0L)).sum
      vocab.map { p =>
        p -> BigDecimal(math.log((counts.getOrElse(p, 0L) + 1).toDouble /
          (t + vocab.size).toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }.toMap
    }
    for (_ <- 0 until 2) {
      val lp = lpOf()
      val seg = words.flatMap { case (w, f) =>
        UnigramLm.viterbiLocal(w, lp, 4).map(_ -> f)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      counts = vocab.map(p => p -> seg.getOrElse(p, 0L)).toMap
      if (vocab.size > 8) {
        val ranked = vocab.sortBy(p => (-counts(p), p))
        vocab = (ranked.take(8) ++ vocab.filter(_.length == 1)).distinct
      }
    }
    assert(pruned.pieces.toMap == vocab.map(p => p -> counts(p)).toMap,
      s"engine=${pruned.pieces.toMap}\nreference=${vocab.map(p => p -> counts(p)).toMap}")
  }

  test("segment covers every word: pieces concatenate back to the word") {
    val model = UnigramLm.train(corpus, "text", maxLen = 4, seedSize = 20,
      iters = 1)
    val seg = UnigramLm.segment(corpus, "text", model)
    val rows = seg.select(col("text"), col("unigram_pieces")).collect()
    rows.foreach { r =>
      val expect = r.getString(0).toLowerCase
        .split("[^a-z0-9]+").filter(_.nonEmpty).mkString
      assert(r.getSeq[String](1).mkString == expect)
    }
    // distinct-word memo: piece arrays are non-empty for non-empty docs
    assert(rows.forall(_.getSeq[String](1).nonEmpty))
  }
}
