package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declarative dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v) }}}
  *
  * (with optional casts-to-double around the lambda variables) into the
  * native codegen'd [[ArrayDot]]. Users writing the idiomatic
  * higher-order-function form — which Spark evaluates interpreted, one
  * zipped array allocation per row — silently get the primitive loop
  * instead (measured 3.5× on the embedding near-dup pipeline).
  *
  * The match is deliberately conservative: it fires only when the
  * merge is a bare `acc + v` over a `0.0D` zero with an identity
  * finish, the zip lambda is a bare product of the two lambda
  * variables (through casts at most), and both inputs are
  * float/double arrays — exactly the shape [[ArrayDot]] reproduces
  * bit-for-bit including null semantics (null array, length mismatch,
  * null element → NULL; proven equal in RollingHashSpec).
  */
object RewriteArrayDot extends Rule[LogicalPlan] {

  private def stripDoubleCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => stripDoubleCast(c.child)
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    stripDoubleCast(e) match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def floatingArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithSubqueries {
      case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(mx, my, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(aa, av, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(facc: NamedLambdaVariable), _))
        if floatingArray(l) && floatingArray(r) &&
          // product of exactly the two zip variables, either order
          ((isVar(mx, x) && isVar(my, y)) || (isVar(mx, y) && isVar(my, x))) &&
          // merge is exactly acc + element, either order
          ((isVar(aa, acc) && isVar(av, v)) || (isVar(aa, v) && isVar(av, acc))) &&
          // identity finish
          fin.exprId == facc.exprId =>
        ArrayDot(l, r)
    }
}
