package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_len(text, level)`: the DEFLATE-compressed byte length of a
  * string's UTF-8 bytes — the primitive under the compression-ratio
  * quality signal (ratio = deflate_len / octet_length) used by
  * Gopher/CCNet-class pipelines to catch pathologically repetitive
  * documents (boilerplate, keyword stuffing, generator loops) that
  * token-level repetition rules miss.
  *
  * Returns the size only (a long), not the compressed bytes: the signal
  * needs one number per document, and composing the ratio in SQL keeps
  * this kernel primitive. Codegen'd scalar (one reusable Deflater per
  * call — cheap; JDK zlib allocates lazily), map-only at any scale.
  *
  * Determinism: DEFLATE output for a fixed input and level is stable
  * for a given zlib build, so the value is replayable within an
  * environment but NOT a cross-engine contract — this kernel is
  * spec-gated (differential vs a direct java.util.zip replay), not
  * oracle-gated.
  */
case class DeflateLen(child: Expression, level: Int) extends UnaryExpression {

  require(level >= 1 && level <= 9, s"deflate_len: level must be 1..9: $level")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires a string argument, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String], level)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.DeflateLen.compute($c, $level);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {

  // one reusable native Deflater per (thread, level) — reset() between
  // rows instead of alloc/end churn on every document (bounded native
  // state: ≤9 deflaters per executor thread, freed with the thread)
  private val perThread = new ThreadLocal[Array[Deflater]] {
    override def initialValue(): Array[Deflater] = new Array[Deflater](10)
  }

  /** Compressed length of the UTF-8 bytes at the given level (raw
    * DEFLATE stream incl. the zlib header/trailer the JDK emits). */
  def compute(s: UTF8String, level: Int): Long = {
    val pool = perThread.get()
    var d = pool(level)
    if (d == null) { d = new Deflater(level); pool(level) = d }
    try {
      d.setInput(s.getBytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally {
      // reset in finally (not lazily on the next row): drops the
      // deflater's reference to this row's input bytes — otherwise each
      // thread pins the largest recent document until its next call at
      // this level — AND guarantees a clean deflater even if deflate()
      // throws or the task is killed mid-document, where dirty state
      // would corrupt the NEXT row's compressed length at this level
      d.reset()
    }
  }

  /** Column surface; registers the SQL function on the active session
    * (idempotent), same contract as [[ArrayDot]]. */
  def apply(text: Column, level: Int = 6): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("deflate_len",
      text, org.apache.spark.sql.functions.lit(level))
  }
}
