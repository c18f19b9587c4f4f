package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native greedy longest-prefix (WordPiece-family) segment counter.
  *
  * Replaces the `mapPartitions` row loop in
  * operators/WordPiece.segmentCounts: that shape deserializes every
  * row through a Row encoder and fences whole-stage codegen around the
  * memo frame — the same interpreted-boundary pattern `graft_viterbi`
  * retired for the unigram family (ref dask-expr has no tokenizer
  * surface; the algorithm is the published WordPiece greedy matcher,
  * Wu et al. 2016 §4.1 simplified to no continuation marker). One
  * codegen'd call per DISTINCT word runs the longest-match scan in a
  * tight JVM loop against a plan-baked vocabulary HashSet.
  *
  * Semantics are pinned to the retained `segmentCountLocal` reference
  * loop (WordPieceSpec differential): consume left-to-right, take the
  * LONGEST vocabulary piece at each position, fall back to a single
  * character; counting is in Java chars (BMP-identical to the SQL
  * replay's code points — the corpora are ASCII; documented deviation
  * for supplementary planes).
  */
object WordPieceKernels {
  def count(word: UTF8String, vocab: java.util.HashSet[String],
      maxLen: Int): Int = {
    val w = word.toString
    val L = w.length
    var pos = 0
    var n = 0
    while (pos < L) {
      var l = math.min(maxLen, L - pos)
      var adv = 1
      var found = false
      while (l >= 1 && !found) {
        if (vocab.contains(w.substring(pos, pos + l))) { adv = l; found = true }
        l -= 1
      }
      pos += adv
      n += 1
    }
    n
  }
}

/** `graft_wordpiece(word, vocab_array_literal)`: greedy longest-prefix
  * piece count of `word` under the vocabulary (see
  * [[WordPieceKernels.count]]); the vocabulary is baked into the plan
  * (addReferenceObj) — the O(V) "parameters small, data huge" layout,
  * same contract as [[ViterbiPieces]]. */
case class WordPieceCount(child: Expression, vocab: Seq[String])
  extends UnaryExpression {

  @transient private lazy val jset: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }
  private val maxLen: Int =
    if (vocab.isEmpty) 1 else vocab.iterator.map(_.length).max

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_wordpiece requires a string argument, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_wordpiece"

  override protected def nullSafeEval(input: Any): Any =
    WordPieceKernels.count(input.asInstanceOf[UTF8String], jset, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordpieceVocab", jset,
      "java.util.HashSet<String>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordPieceKernels.count($c, $setRef, $maxLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordPieceCount =
    copy(child = newChild)
}

object WordPieceCount {
  /** Column surface; registers the SQL function on the active session
    * (idempotent), same contract as [[ViterbiPieces]]. */
  def apply(word: Column, vocab: Seq[String]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("graft_wordpiece",
      word, org.apache.spark.sql.functions.typedLit(vocab))
  }
}
