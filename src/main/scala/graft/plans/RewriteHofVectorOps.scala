package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.{DotProductF, L2Dist2F}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,v) ->
  * acc+v)` over two `array<float>` columns — into the native codegen
  * [[DotProductF]] expression.
  *
  * The HOF form evaluates its lambdas interpreted, element by element,
  * with boxed doubles; the native fold is a primitive loop inside
  * whole-stage codegen. The rewrite is safe because DotProductF matches
  * the HOF bit-for-bit INCLUDING null semantics (sequential left-to-
  * right double fold; NULL on length mismatch or null element) — pinned
  * by VectorOpsSpec's differential tests. Users who write the natural
  * declarative form get the fast path without knowing dot_f exists;
  * injected via `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Deliberately conservative: only the exact canonical shape (possibly
  * with float→double casts inside the zip lambda, the literal 0.0 zero,
  * and an identity/absent finish) is rewritten; anything else is left
  * untouched.
  */
object RewriteHofVectorOps extends Rule[LogicalPlan] {

  private def strips(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => strips(c)
    case other => other
  }

  /** The zip lambda's multiply of its two (possibly double-cast)
    * lambda variables. */
  private def isElementMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l, r, _), Seq(x: NamedLambdaVariable,
        y: NamedLambdaVariable), _) =>
      (strips(l), strips(r)) match {
        case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
          (lv.exprId == x.exprId && rv.exprId == y.exprId) ||
            (lv.exprId == y.exprId && rv.exprId == x.exprId)
        case _ => false
      }
    case _ => false
  }

  /** The zip lambda's squared difference (x-y)*(x-y) — or (y-x)*(y-x) —
    * of its two (possibly double-cast) lambda variables. */
  private def isElementSquaredDiff(f: Expression): Boolean = f match {
    case LambdaFunction(
        Multiply(Subtract(a1, b1, _), Subtract(a2, b2, _), _),
        Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _) =>
      (strips(a1), strips(b1), strips(a2), strips(b2)) match {
        case (l1: NamedLambdaVariable, r1: NamedLambdaVariable,
            l2: NamedLambdaVariable, r2: NamedLambdaVariable) =>
          l1.exprId == l2.exprId && r1.exprId == r2.exprId &&
            Set(l1.exprId, r1.exprId) == Set(x.exprId, y.exprId) &&
            l1.exprId != r1.exprId
        case _ => false
      }
    case _ => false
  }

  /** merge = (acc, v) -> acc + v in either operand order. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l, r, _), Seq(acc: NamedLambdaVariable,
        v: NamedLambdaVariable), _) =>
      (l, r) match {
        case (lv: NamedLambdaVariable, rv: NamedLambdaVariable) =>
          (lv.exprId == acc.exprId && rv.exprId == v.exprId) ||
            (lv.exprId == v.exprId && rv.exprId == acc.exprId)
        case _ => false
      }
    case _ => false
  }

  /** finish = identity over the accumulator. */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable,
        Seq(acc: NamedLambdaVariable), _) => body.exprId == acc.exprId
    case _ => false
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(a, b, zipF), Literal(0.0, DoubleType), mergeF, finishF)
          if isFloatArray(a) && isFloatArray(b) &&
            isElementMultiply(zipF) && isSumMerge(mergeF) &&
            isIdentityFinish(finishF) =>
        DotProductF(a, b)
      // (x-y)² note: squared-difference is symmetric, so matching either
      // operand order is sound
      case ArrayAggregate(
          ZipWith(a, b, zipF), Literal(0.0, DoubleType), mergeF, finishF)
          if isFloatArray(a) && isFloatArray(b) &&
            isElementSquaredDiff(zipF) && isSumMerge(mergeF) &&
            isIdentityFinish(finishF) =>
        L2Dist2F(a, b)
    }
}
