package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram language-model subword tokenizer — Kudo 2018 ("Subword
  * Regularization", the SentencePiece `unigram` algorithm; ref
  * dask-expr has no tokenizer surface — this completes the in-engine
  * subword-family triad beside [[Bpe]] (GPT-style merges) and
  * [[WordPiece]] (BERT-style greedy-longest-match): the unigram LM is
  * what Llama/T5-class vocabularies actually train).
  *
  * Training is EM over the Zipf-bounded distinct-word memo (the [[Bpe]]
  * pattern — the corpus is scanned ONCE for the word table; every EM
  * pass is over distinct words, weighted by corpus frequency):
  *  - seed vocabulary: every substring occurrence (length ≤ maxLen) of
  *    every distinct word, corpus-frequency-weighted; top `seedSize`
  *    by (count desc, piece asc) plus ALL single characters (coverage
  *    guarantee — every position is always reachable in Viterbi);
  *  - E-step: per-word Viterbi segmentation under current piece
  *    log-probs, computed IN-PLAN as two bounded folds (forward DP +
  *    backtrace) with the log-prob table riding as an O(V) map literal
  *    — map-only, zero joins, the [[QualityModel]] GD layout
  *    ("parameters small, data huge");
  *  - M-step: piece counts from the segmentations (one vocab-sized
  *    aggregate, collected — driver state is O(V) like the GD weight
  *    vector), re-normalized with add-one smoothing over the FIXED
  *    seed vocabulary.
  *
  * Documented deviations from Kudo 2018 (chosen for exact
  * cross-engine replayability, oracle-checked): hard EM (Viterbi-best
  * counts rather than full-lattice posteriors), add-one smoothing, and
  * count-ranked pruning (`pruneTo` keeps the best pieces + all single
  * chars after each round) rather than likelihood-loss pruning; with
  * pruneTo = 0 the seed vocabulary stays fixed. Determinism firewall: log-probs are rounded to 6
  * decimals before entering the DP (absorbing cross-engine ln() ulp
  * differences); the DP additions themselves are bit-identical IEEE
  * sums in a fixed left-to-right order, and DP ties prefer the longest
  * piece ENDING at the position (max score, then smallest start) in
  * all three implementations (in-plan fold, local mirror, oracle).
  */
object UnigramLm {

  /** Trained model: (piece, Viterbi count) after the last EM round,
    * the smoothed log-probs for encoding, and the DP window. */
  final case class UnigramModel(
      pieces: Seq[(String, Long)],
      logProbs: Map[String, Double],
      maxLen: Int) {
    @transient private lazy val countByPiece: Map[String, Long] = pieces.toMap
    @transient private lazy val total: Long = pieces.iterator.map(_._2).sum
    /** Smoothed probability of a vocabulary piece (add-one over the
      * fixed vocabulary, the same formula the trainer normalizes
      * with). */
    def prob(piece: String): Double =
      (countByPiece.getOrElse(piece, 0L) + 1).toDouble / (total + pieces.size)
  }

  /** Distinct-word table (w, f): the Zipf-bounded memo every EM pass
    * runs over. One corpus scan; [[Bpe.PreTokenPattern]] words. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(regexp_extract_all(lower(col(textCol)),
        lit(Bpe.PreTokenPattern), lit(0))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("f"))

  /** Seed candidates: every (start, len ≤ maxLen) substring OCCURRENCE
    * of every distinct word, weighted by the word's corpus frequency.
    * Vocabulary-sized aggregate (≤ maxLen · Σ|w| distinct pieces). */
  def seedCandidates(words: DataFrame, maxLen: Int): DataFrame =
    words.select(col("f"), explode(flatten(
        transform(sequence(lit(1), length(col("w"))), s =>
          transform(sequence(lit(1),
              least(lit(maxLen), length(col("w")) - s + 1)),
            l => col("w").substr(s, l))))).as("piece"))
      .groupBy("piece").agg(sum("f").as("n"))

  /** Forward Viterbi DP over `w` under log-prob map literal `pm`: one
    * fold over positions 1..|w|, each step maxing over the ≤ maxLen
    * predecessors (missing pieces score −1e9; the single-char seeds
    * keep every position genuinely reachable). Ties prefer the longest
    * piece: array_max on struct(score, −start) takes max score then
    * max −start = smallest start. Returns struct(dp, bp). */
  private def dpFold(w: Column, pm: Column, maxLen: Int): Column =
    aggregate(sequence(lit(1), length(w)),
      struct(array(lit(0.0)).as("dp"), array(lit(0)).as("bp")),
      (st, i) => {
        val best = array_max(transform(
          sequence(greatest(lit(0), i - maxLen), i - 1), j =>
            struct((element_at(st.getField("dp"), j + 1) +
                coalesce(element_at(pm, w.substr(j + 1, i - j)), lit(-1e9)))
                .as("s"),
              (-j).as("nj"))))
        struct(
          concat(st.getField("dp"), array(best.getField("s"))).as("dp"),
          concat(st.getField("bp"), array(-best.getField("nj"))).as("bp"))
      })

  /** Backtrace fold: walks the backpointer array from |w| to 0,
    * prepending pieces — at most |w| steps, so one bounded fold. */
  private def btFold(w: Column, st: Column): Column =
    aggregate(sequence(lit(1), length(w)),
      struct(length(w).as("pos"),
        array().cast(ArrayType(StringType, containsNull = false)).as("ps")),
      (s2, _) => {
        val pos = s2.getField("pos")
        val prev = element_at(st.getField("bp"), pos + 1)
        when(pos > lit(0),
          struct(prev.as("pos"),
            concat(array(w.substr(prev + 1, pos - prev)), s2.getField("ps"))
              .as("ps")))
          .otherwise(s2)
      },
      s2 => s2.getField("ps"))

  /** Per-word Viterbi piece counts under log-probs `lp`: ONE map-only
    * scan of the word memo through the codegen'd
    * [[graft.functions.ViterbiPieces]] kernel (log-prob table baked
    * into the plan via addReferenceObj — the O(V) "parameters small,
    * data huge" layout), then one vocab-sized aggregate. Replaces the
    * two interpreted HOF-fold Projects (forward DP + backtrace) with a
    * tight JVM loop; output is identical (kernel pinned to
    * [[viterbiLocal]] AND to the fold path — UnigramLmSpec
    * differentials). */
  def viterbiCounts(words: DataFrame, lp: Map[String, Double],
      maxLen: Int): DataFrame =
    words
      .select(col("f"),
        explode(graft.functions.ViterbiPieces(col("w"), lp, maxLen)).as("piece"))
      .groupBy("piece").agg(sum("f").as("c"))

  /** The pre-kernel in-plan formulation of [[viterbiCounts]] (forward
    * DP fold + backtrace fold in separate Projects) — kept ONLY as the
    * differential reference the kernel is pinned against
    * (UnigramLmSpec: identical (piece, c) rows on every corpus the
    * trainer sees). */
  private[graft] def viterbiCountsExpr(words: DataFrame, lp: Map[String, Double],
      maxLen: Int): DataFrame = {
    val pm = typedLit(lp)
    words
      .select(col("w"), col("f"), dpFold(col("w"), pm, maxLen).as("__st"))
      .select(col("f"), explode(btFold(col("w"), col("__st"))).as("piece"))
      .groupBy("piece").agg(sum("f").as("c"))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Hard-EM training. Returns the final model; the corpus is scanned
    * once, each EM iteration is one map-only pass over the distinct-
    * word memo plus one vocab-sized aggregate (collected — the same
    * bounded driver sync as [[QualityModel.trainLogReg]]'s gradient). */
  def train(docs: DataFrame, textCol: String, maxLen: Int = 4,
      seedSize: Int = 60, iters: Int = 2, pruneTo: Int = 0): UnigramModel = {
    require(maxLen >= 1 && seedSize >= 1 && iters >= 0 && pruneTo >= 0,
      s"unigram-lm: bad params maxLen=$maxLen seedSize=$seedSize " +
        s"iters=$iters pruneTo=$pruneTo")
    val words = wordTable(docs, textCol).localCheckpoint(false)
    // pinned: the top-seedSize sort and the single-char coverage filter
    // are two consumers — unpinned they re-run the substring-explosion
    // aggregate twice
    val cands = seedCandidates(words, maxLen).localCheckpoint(false)
    val seeds = cands.orderBy(col("n").desc, col("piece")).limit(seedSize)
    // initial vocabulary: top seeds ∪ all single characters (same piece
    // → same count, so distinct collapses the overlap)
    val vocab0: Seq[(String, Long)] = seeds
      .union(cands.filter(length(col("piece")) === 1))
      .distinct().collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
      .sortBy { case (p, n) => (-n, p) }
    var vocab: Seq[String] = vocab0.map(_._1)
    var counts: Map[String, Long] = vocab0.toMap
    def lpOf(): Map[String, Double] = {
      val t = vocab.iterator.map(counts.getOrElse(_, 0L)).sum
      val v = vocab.size
      vocab.map { p =>
        p -> round6(math.log((counts.getOrElse(p, 0L) + 1).toDouble /
          (t + v).toDouble))
      }.toMap
    }
    for (_ <- 0 until iters) {
      val seg = viterbiCounts(words, lpOf(), maxLen).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      counts = vocab.map(p => p -> seg.getOrElse(p, 0L)).toMap
      // Kudo 2018 §3.2's vocabulary-size control, in the hard-EM
      // setting: after each round, keep the pruneTo best pieces by
      // (Viterbi count desc, piece) plus ALL single characters (the
      // coverage floor Kudo also never prunes). With pruneTo = 0 the
      // vocabulary is fixed (the oracle-checked default). Seed large,
      // prune to the target — the production SentencePiece discipline.
      if (pruneTo > 0 && vocab.size > pruneTo) {
        val ranked = vocab.sortBy(p => (-counts(p), p))
        // char floor in CODEPOINTS: Spark's length() and DuckDB's
        // length() both count codepoints, so a supplementary-plane
        // single character must survive here too
        vocab = (ranked.take(pruneTo) ++
          vocab.filter(p => p.codePointCount(0, p.length) == 1)).distinct
      }
    }
    val pieces = vocab.map(p => (p, counts.getOrElse(p, 0L)))
    UnigramModel(pieces, lpOf(), maxLen)
  }

  /** The trained vocabulary as a frame: (piece, n, p) with the same
    * add-one-smoothed probability the trainer normalizes with, rounded
    * to 9 decimals. Vocab-sized local relation (the heavy work was the
    * distributed EM). */
  def vocabDF(spark: SparkSession, model: UnigramModel): DataFrame = {
    val t = model.pieces.iterator.map(_._2).sum
    val v = model.pieces.size
    val rows = model.pieces.map { case (p, n) =>
      Row(p, n, BigDecimal((n + 1).toDouble / (t + v).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 1),
      StructType(Seq(StructField("piece", StringType, nullable = false),
        StructField("n", LongType, nullable = false),
        StructField("p", DoubleType, nullable = false))))
  }

  /** Driver/executor-local Viterbi (the imperative mirror of the
    * in-plan folds — shared by [[segment]]'s memo and the differential
    * spec that pins the two implementations together). */
  def viterbiLocal(word: String, lp: Map[String, Double],
      maxLen: Int): Seq[String] = {
    val L = word.length
    if (L == 0) return Seq.empty
    val dp = new Array[Double](L + 1)
    val bp = new Array[Int](L + 1)
    var i = 1
    while (i <= L) {
      var bestS = Double.NegativeInfinity
      var bestJ = -1
      var j = math.max(0, i - maxLen)
      while (j <= i - 1) {
        val s = dp(j) + lp.getOrElse(word.substring(j, i), -1e9)
        if (s > bestS) { bestS = s; bestJ = j }
        j += 1
      }
      dp(i) = bestS; bp(i) = bestJ
      i += 1
    }
    val out = List.newBuilder[String]
    val rev = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = L
    while (pos > 0) { rev += word.substring(bp(pos), pos); pos = bp(pos) }
    out ++= rev.reverse
    out.result()
  }

  /** Per-document unigram-LM TOKENIZATION: every input column plus an
    * appended `unigram_pieces` array<string> — pure partition-batched
    * map with a distinct-word memo, the [[Bpe.tokenPieces]] shape. */
  def segment(df: DataFrame, textCol: String,
      model: UnigramModel): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row => SRow}
    val textIdx = df.schema.fieldIndex(textCol)
    val out = StructType(df.schema.fields :+
      StructField("unigram_pieces", ArrayType(StringType, containsNull = false)))
    implicit val enc = Encoders.row(out)
    val lp = model.logProbs
    val maxLen = model.maxLen
    val preTok = Bpe.PreTokenPattern
    df.mapPartitions { it =>
      val pat = java.util.regex.Pattern.compile(preTok)
      val memo = scala.collection.mutable.HashMap.empty[String, Seq[String]]
      it.map { r =>
        val text = r.getString(textIdx)
        val pieces = scala.collection.mutable.ArrayBuffer.empty[String]
        if (text != null) {
          val m = pat.matcher(text.toLowerCase(java.util.Locale.ROOT))
          while (m.find()) {
            val w = m.group()
            pieces ++= memo.getOrElseUpdate(w, viterbiLocal(w, lp, maxLen))
          }
        }
        SRow.fromSeq(r.toSeq :+ pieces.toSeq)
      }
    }
  }
}
