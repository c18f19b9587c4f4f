package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression: dot product of two float/double array
  * columns, accumulated left-to-right in double.
  *
  * This is the embedding pipeline's hot inner loop (cosine top-k, LSH
  * bucket verification, IVF probe, k-means assignment — each evaluates
  * it per candidate pair). The `aggregate(zip_with(a, b, _*_), ...)`
  * form it replaces is interpreted (higher-order functions don't
  * participate in whole-stage codegen) and allocates a zipped array per
  * row pair; this compiles to a primitive loop over the two
  * `ArrayData`s with no allocation.
  *
  * Null semantics replicate the HOF fold exactly, so plans can swap one
  * for the other without an oracle change: NULL if either array is
  * NULL, if lengths differ (zip_with pads, null poisons the sum), or if
  * any element is NULL. Accumulation order is ascending index — the
  * same IEEE result as the fold and as an ORDER-BY-index SQL replay.
  */
case class ArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType
  // length mismatch / null element → NULL even for non-null inputs
  override def nullable: Boolean = true
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (b.numElements() != n) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = lt match {
        case FloatType => a.getFloat(i).toDouble
        case _ => a.getDouble(i)
      }
      val y = rt match {
        case FloatType => b.getFloat(i).toDouble
        case _ => b.getDouble(i)
      }
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      def get(et: DataType, arr: String, i: String): String = et match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  int $i = 0;
         |  while ($i < $n) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (${get(elemType(left), a, i)}) * (${get(elemType(right), b, i)});
         |    $i++;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

object ArrayDot {
  /** Column surface; registers the SQL function on the active session
    * (idempotent), same contract as [[UnicodeNormalize]]. */
  def apply(a: Column, b: Column): Column = {
    org.apache.spark.sql.SparkSession.getActiveSession
      .foreach(GraftFunctions.register)
    org.apache.spark.sql.functions.call_function("array_dot", a, b)
  }
}
