package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE encode kernels (Sennrich et al. 2016 merge loop; the
  * reference tokenizer is operators/Bpe.encodePieces — these kernels
  * delegate to it, so the merge semantics live in exactly one place).
  *
  * They replace the `mapPartitions` row loops in Bpe.tokenPieces /
  * tokenCounts: that shape re-encodes EVERY input column through a Row
  * encoder and fences whole-stage codegen (the boundary the
  * graft_wordpiece/graft_viterbi kernels retired for the other two
  * tokenizer families). The merge table rides in the plan
  * (addReferenceObj); the distinct-word memo is a per-THREAD transient
  * (amortizes the merge loop across a task exactly like the old
  * per-partition memo — word frequency is Zipfian, so nearly every
  * lookup hits; bounded by the distinct words a thread sees). */
private[functions] abstract class BpeKernelBase extends UnaryExpression {
  def merges: Seq[(String, String)]

  @transient protected lazy val ranks: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  // ThreadLocal: expression instances are per-task in practice, but an
  // interpreted-eval path could share one across threads — a shared
  // mutable HashMap would corrupt, a per-thread memo just re-amortizes.
  @transient protected lazy val pieceMemo:
      ThreadLocal[java.util.HashMap[String, Array[String]]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, Array[String]]())

  @transient private lazy val preTok =
    java.util.regex.Pattern.compile(graft.operators.Bpe.PreTokenPattern)

  protected def encodeWord(w: String): Array[String] = {
    val memo = pieceMemo.get()
    var got = memo.get(w)
    if (got == null) {
      got = graft.operators.Bpe.encodePieces(w, ranks)
      memo.put(w, got)
    }
    got
  }

  protected def matcher(text: UTF8String): java.util.regex.Matcher =
    preTok.matcher(text.toString.toLowerCase(java.util.Locale.ROOT))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType}")
}

/** `graft_bpe_pieces(text, merges_array_literal)`: the document's full
  * BPE piece sequence in reading order (what a dataloader consumes
  * after a piece→id dictionary join). */
case class BpePieces(child: Expression, merges: Seq[(String, String)])
  extends BpeKernelBase {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_pieces"

  def pieces(text: UTF8String): ArrayData = {
    val out = new scala.collection.mutable.ArrayBuffer[Any](32)
    val m = matcher(text)
    while (m.find()) {
      val ps = encodeWord(m.group())
      var i = 0
      while (i < ps.length) { out += UTF8String.fromString(ps(i)); i += 1 }
    }
    new GenericArrayData(out.toArray)
  }

  override protected def nullSafeEval(input: Any): Any =
    pieces(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("bpePiecesExpr", this,
      classOf[BpePieces].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $selfRef.pieces($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpePieces =
    copy(child = newChild)
}

/** `graft_bpe_count(text, merges_array_literal)`: the document's BPE
  * token count — the pieces kernel's cheap sibling (no piece strings
  * are materialized, only per-word symbol counts). */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
  extends BpeKernelBase {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"

  def count(text: UTF8String): Long = {
    var n = 0L
    val m = matcher(text)
    while (m.find()) n += encodeWord(m.group()).length
    n
  }

  override protected def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("bpeCountExpr", this,
      classOf[BpeCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $selfRef.count($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

/** `graft_bpe_encode(text, merges_array_literal, sep)`: one-pass
  * struct(pieces_str, n_pieces) — the piece sequence already joined
  * with `sep` plus its count, built in a single pre-tokenize scan
  * (no per-row piece ARRAY materialization, no second regex pass for
  * the count; the dataloader-manifest shape q_bpe_tokenize emits). */
case class BpeEncode(child: Expression, merges: Seq[(String, String)],
    sep: String) extends BpeKernelBase {

  override def dataType: DataType = StructType(Seq(
    StructField("pieces_str", StringType, nullable = false),
    StructField("n_pieces", LongType, nullable = false)))
  override def prettyName: String = "graft_bpe_encode"

  def encode(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val sb = new java.lang.StringBuilder(text.numBytes() * 2)
    var n = 0L
    val m = matcher(text)
    while (m.find()) {
      val ps = encodeWord(m.group())
      var i = 0
      while (i < ps.length) {
        if (n > 0L) sb.append(sep)
        sb.append(ps(i))
        n += 1L
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString(sb.toString), n)
  }

  override protected def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("bpeEncodeExpr", this,
      classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $selfRef.encode($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeKernels {
  private def mergesLit(merges: Seq[(String, String)]): Column =
    // pre-token symbols never contain whitespace (PreTokenPattern), so
    // "left right" strings are an unambiguous literal encoding
    org.apache.spark.sql.functions.typedLit(
      merges.map { case (a, b) => s"$a $b" })

  def pieces(text: Column, merges: Seq[(String, String)]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("graft_bpe_pieces",
      text, mergesLit(merges))
  }

  def count(text: Column, merges: Seq[(String, String)]): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("graft_bpe_count",
      text, mergesLit(merges))
  }

  def encode(text: Column, merges: Seq[(String, String)],
      sep: String): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("graft_bpe_encode",
      text, mergesLit(merges), org.apache.spark.sql.functions.lit(sep))
  }

  /** Shared literal decode for the SQL builders. */
  private[functions] def decodeMerges(e: Expression): Seq[(String, String)] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    e match {
      case Literal(a: ArrayData, ArrayType(StringType, _)) =>
        (0 until a.numElements()).map { i =>
          val s = a.getUTF8String(i).toString
          val sp = s.indexOf(' ')
          require(sp > 0 && sp < s.length - 1,
            s"merge entry must be 'left right', got '$s'")
          (s.substring(0, sp), s.substring(sp + 1))
        }
      case other => throw new IllegalArgumentException(
        s"merges must be an array<string> literal of 'left right' pairs, got $other")
    }
  }
}
