package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Greedy longest-prefix vocabulary tokenizer (the WordPiece /
  * SentencePiece-greedy family, simplified: no continuation marker):
  * the vocabulary is the corpus's top-K whole words plus every distinct
  * character (so segmentation always terminates and nothing is OOV);
  * each word is consumed left-to-right taking the LONGEST vocabulary
  * piece at each position, falling back to a single character.
  *
  * Scale design mirrors Bpe.tokenCounts: segmentation happens once per
  * DISTINCT word (Zipf-bounded memo frame, not the corpus word stream)
  * and joins back onto the stream by word; the vocabulary is a bounded
  * driver collect (top-K + charset) that rides into the task closure.
  *
  * Character positions are Java chars on the engine side and code
  * points in the SQL replay — identical for BMP text (the corpora are
  * ASCII); supplementary-plane text would count differently
  * (documented deviation).
  */
object WordPiece {

  /** Top-`topWords` words by (count desc, word asc) + every distinct
    * character of the corpus. Bounded driver collect. */
  def buildVocab(docs: DataFrame, textCol: String, topWords: Int): Seq[String] = {
    require(topWords >= 0, s"topWords >= 0, got $topWords")
    val words = docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
    val top = words.groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(topWords)
      .collect().map(_.getString(0))
    // Charset from the DISTINCT words (Zipf-tiny), not a per-character
    // corpus explode: every character that can appear inside a word is
    // in some word by construction (the only text character missing is
    // the space separator, which can never match within a word), so
    // segmentation behavior is identical and the scan is vocabulary-
    // sized instead of corpus-sized.
    val chars = words.distinct()
      .select(explode(transform(sequence(lit(1), length(col("w"))),
        i => col("w").substr(i, lit(1)))).as("ch"))
      .distinct().collect().map(_.getString(0))
    (top ++ chars).distinct.toSeq
  }

  /** Greedy piece count per word: one row per input word with its
    * segment count appended. Input must have a single "word" column.
    *
    * r17: the count is the codegen'd `graft_wordpiece` kernel
    * (functions.WordPieceKernel — vocabulary plan-baked via
    * addReferenceObj), replacing a mapPartitions row loop that paid a
    * Row-encoder boundary and fenced whole-stage codegen around the
    * memo frame; bit-identical to [[segmentCountLocal]]
    * (WordPieceSpec differential). */
  def segmentCounts(words: DataFrame, vocab: Seq[String]): DataFrame =
    words.select(col("word"),
      graft.functions.WordPieceCount(col("word"), vocab).as("n_pieces"))

  /** Reference greedy longest-prefix loop — the semantics the kernel
    * is differentially pinned against (and the original mapPartitions
    * implementation's exact body). */
  private[graft] def segmentCountLocal(w: String, vocab: Set[String],
      maxLen: Int): Int = {
    var pos = 0; var n = 0
    while (pos < w.length) {
      var l = math.min(maxLen, w.length - pos)
      var adv = 1
      var found = false
      while (l >= 1 && !found) {
        if (vocab.contains(w.substring(pos, pos + l))) {
          adv = l; found = true
        }
        l -= 1
      }
      pos += adv; n += 1
    }
    n
  }

  /** Tokenizer fertility report per `srcCol` group: word occurrences,
    * greedy-piece tokens, and tokens-per-word — the measurement that
    * tells you how a fixed vocabulary prices each corpus source into
    * tokens (budgeting input for mixture planning).
    *
    * r17 shape: ONE corpus word explode feeds a (source, word, c)
    * pre-aggregate (Zipf-bounded: |sources| × |vocabulary| rows,
    * pinned — it has three consumers), and everything downstream is
    * vocabulary-sized: the top-K vocabulary and the charset derive
    * from its word margin, the kernel segments each DISTINCT word
    * once, and the report sums c·n_pieces — no second corpus explode
    * and no corpus-sized join (the r16 shape exploded the corpus three
    * times and joined the full occurrence stream; zipf1 4.6 → see
    * BASELINE). */
  def fertilityBySource(docs: DataFrame, textCol: String, srcCol: String,
      topWords: Int = 10): DataFrame = {
    require(topWords >= 0, s"topWords >= 0, got $topWords")
    val swc = docs.select(col(srcCol).as("source"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(length(col("word")) >= 1)
      .groupBy("source", "word").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val wc = swc.groupBy("word").agg(sum(col("c")).as("cnt"))
    val top = wc.orderBy(col("cnt").desc, col("word")).limit(topWords)
      .collect().map(_.getString(0))
    // charset from the distinct words (see buildVocab: the only text
    // character missing is the space separator, which can never match
    // within a word)
    val chars = wc.select(explode(transform(
        sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))).as("ch"))
      .distinct().collect().map(_.getString(0))
    val vocab = (top ++ chars).distinct.toSeq
    val seg = segmentCounts(swc.select("word").distinct(), vocab)
    swc.join(seg, "word")
      .groupBy("source")
      .agg(sum(col("c")).cast("long").as("n_words"),
        sum(col("c") * col("n_pieces")).cast("long").as("n_tokens"),
        (round(sum(col("c") * col("n_pieces")).cast("double")
          / sum(col("c")).cast("double"), 9) + lit(0.0)).as("fertility"))
  }
}
