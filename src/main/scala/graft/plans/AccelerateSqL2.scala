package graft.plans

import graft.functions.SqL2
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the higher-order-function squared-L2 pattern
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),
  *     0.0, (acc, v) -> acc + v) }}}
  *
  * into the native codegen'd [[SqL2]] — the distance twin of
  * [[AccelerateCosine]]. Always safe (no mode split needed): SqL2
  * reproduces the HOF form's null semantics exactly (null array / null
  * element / length mismatch → null) and there is no divisor, so ANSI
  * and legacy agree; the fold accumulates in the same index order, so
  * results are bit-identical.
  *
  * The Multiply's two operands must be the SAME (x - y) subtraction —
  * matched structurally on the lambda variables by exprId, so
  * `(x - y) * (y - x)` or a reused variable does NOT match.
  */
object AccelerateSqL2 extends Rule[LogicalPlan] {

  private def diffOfParams(e: Expression, declared: Seq[NamedLambdaVariable])
      : Option[(ExprId, ExprId)] = e match {
    case Subtract(x: NamedLambdaVariable, y: NamedLambdaVariable, _)
        if declared.length == 2 &&
          Set(x.exprId, y.exprId) == declared.map(_.exprId).toSet &&
          x.exprId != y.exprId =>
      Some((x.exprId, y.exprId))
    case _ => None
  }

  private def foldIsPlainAdd(body: Expression, declared: Seq[NamedLambdaVariable]): Boolean =
    body match {
      case Add(p: NamedLambdaVariable, q: NamedLambdaVariable, _) =>
        declared.length == 2 &&
          Set(p.exprId, q.exprId) == declared.map(_.exprId).toSet &&
          p.exprId != q.exprId
      case _ => false
    }

  private def doubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case orig @ ArrayAggregate(
          ZipWith(a, b, LambdaFunction(Multiply(d1, d2, _), zipArgs, _)),
          Literal(0.0, DoubleType),
          LambdaFunction(foldBody, foldArgs, _),
          _) =>
        val declared = zipArgs.collect { case v: NamedLambdaVariable => v }
        (diffOfParams(d1, declared), diffOfParams(d2, declared)) match {
          case (Some(k1), Some(k2))
              if k1 == k2 &&
                foldIsPlainAdd(foldBody,
                  foldArgs.collect { case v: NamedLambdaVariable => v }) &&
                doubleArray(a) && doubleArray(b) =>
            SqL2(a, b)
          case _ => orig
        }
    }
}
