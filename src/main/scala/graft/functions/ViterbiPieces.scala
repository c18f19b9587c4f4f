package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native unigram-LM Viterbi kernel (Kudo 2018 hard-EM E-step).
  *
  * The in-plan formulation it replaces was two interpreted
  * higher-order-function folds per word (forward DP `aggregate` +
  * backtrace `aggregate`, each step allocating struct/array rows with
  * no whole-stage codegen) — the exact pattern the feature-dot kernels
  * measured at 3–10× interpreted overhead. One codegen'd call per word
  * runs the DP in a tight JVM loop: primitive dp/bp arrays, one
  * `getOrDefault` per candidate piece, zero Catalyst evaluation.
  *
  * Semantics are pinned to [[graft.operators.UnigramLm.viterbiLocal]]
  * (the reference implementation the differential spec compares all
  * paths against): missing pieces score −1e9 (not −∞), DP sums are the
  * same left-to-right IEEE additions, and ties prefer the longest piece
  * ENDING at the position (strict `>` with the predecessor scan running
  * from the smallest start keeps the SMALLEST start on ties).
  */
object UnigramKernels {

  /** Viterbi-best segmentation of `word` under log-prob table `lp`;
    * empty word → empty array. */
  def viterbi(word: String, lp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): Array[String] = {
    val L = word.length
    if (L == 0) return Array.empty[String]
    val dp = new Array[Double](L + 1)
    val bp = new Array[Int](L + 1)
    var i = 1
    while (i <= L) {
      var bestS = Double.NegativeInfinity
      var bestJ = -1
      var j = math.max(0, i - maxLen)
      while (j <= i - 1) {
        val p = lp.get(word.substring(j, i))
        val s = dp(j) + (if (p == null) -1e9 else p.doubleValue())
        if (s > bestS) { bestS = s; bestJ = j }
        j += 1
      }
      dp(i) = bestS; bp(i) = bestJ
      i += 1
    }
    var n = 0
    var pos = L
    while (pos > 0) { n += 1; pos = bp(pos) }
    val out = new Array[String](n)
    pos = L
    var k = n - 1
    while (pos > 0) { out(k) = word.substring(bp(pos), pos); k -= 1; pos = bp(pos) }
    out
  }

  def viterbiPieces(w: UTF8String, lp: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): ArrayData = {
    val ps = viterbi(w.toString, lp, maxLen)
    val out = new Array[Any](ps.length)
    var i = 0
    while (i < ps.length) { out(i) = UTF8String.fromString(ps(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** `graft_viterbi(word, logprob_map_literal, maxLen)`: the Viterbi-best
  * piece array of `word` (see [[UnigramKernels.viterbi]]); the log-prob
  * table is baked into the plan (addReferenceObj), the O(V)
  * "parameters small, data huge" layout. */
case class ViterbiPieces(child: Expression, lp: Map[String, Double], maxLen: Int)
  extends UnaryExpression {

  require(maxLen >= 1, s"graft_viterbi: maxLen must be >= 1, got $maxLen")

  @transient private lazy val jmap: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](lp.size * 2)
    lp.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_viterbi requires a string argument, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_viterbi"

  override protected def nullSafeEval(input: Any): Any =
    UnigramKernels.viterbiPieces(input.asInstanceOf[UTF8String], jmap, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("viterbiLogProbs", jmap,
      "java.util.HashMap<String, Double>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.UnigramKernels.viterbiPieces($c, $mapRef, $maxLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): ViterbiPieces =
    copy(child = newChild)
}

object ViterbiPieces {
  /** Column surface; registers the SQL function on the active session
    * (idempotent), same contract as [[ArrayDot]]. */
  def apply(word: Column, lp: Map[String, Double], maxLen: Int): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("graft_viterbi",
      word, org.apache.spark.sql.functions.typedLit(lp),
      org.apache.spark.sql.functions.lit(maxLen))
  }
}
