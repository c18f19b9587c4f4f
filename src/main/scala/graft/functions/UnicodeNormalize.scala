package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (NFC/NFD/NFKC/NFKD)
  * of a string column — the `str.normalize` accessor (reference
  * `_str_accessor.py` `normalize`; pandas `Series.str.normalize(form)`).
  *
  * Spark has no built-in normalization function; a Scala UDF would break
  * whole-stage codegen and add a serialization boundary, so this is a
  * codegen'd expression like [[RollingHash]]. The normalization form is
  * fixed at plan time (a data-independent literal in pandas too), so it
  * compiles to a static `Normalizer.Form` reference — no per-row
  * dispatch.
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression {

  require(UnicodeNormalize.forms.contains(form),
    s"normalize form must be one of ${UnicodeNormalize.forms.mkString("/")}, got $form")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires a string argument, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = UTF8String.fromString(java.text.Normalizer.normalize(
         |  $c.toString(), java.text.Normalizer.Form.$form));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Column-level entry point (used by the Series.str facade).
    * Resolves through the function registry at analysis time, so the
    * executing session needs [[GraftFunctions.register]] (or the
    * `graft.GraftExtensions` session extension) — same contract as the
    * SQL surface. Registration is idempotent, so facade construction
    * registers on the active session when one exists.
    */
  def apply(c: Column, form: String): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function(
      "unicode_normalize", c, org.apache.spark.sql.functions.lit(form))
  }
}
