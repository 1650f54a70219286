package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.EvalMode
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the declarative integer dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v)
  *
  * into the native codegen'd [[DotProductLong]] whenever a and b are
  * ARRAY<BIGINT>. Users keep writing the composable built-in form
  * (graft.operators.Similarity.dotQ) and transparently get the tight
  * primitive loop — the same "declare the plan, let the optimizer pick
  * the kernel" contract Catalyst applies to its own operators.
  *
  * Safe for all inputs because DotProductLong reproduces the HOF
  * semantics bit-for-bit, including null poisoning and the
  * unequal-length → null behavior (see its scaladoc).
  *
  * Registered via GraftExtensions.injectOptimizerRule.
  */
object RewriteDotProduct extends Rule[LogicalPlan] {

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  /** (x, y) -> x * y over exactly the lambda's own two arguments. */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _) =>
      (l.exprId == a1.exprId && r.exprId == a2.exprId) ||
        (l.exprId == a2.exprId && r.exprId == a1.exprId)
    case _ => false
  }

  /** (acc, v) -> acc + v over exactly the lambda's own two arguments. */
  private def isSumMerge(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a1: NamedLambdaVariable, a2: NamedLambdaVariable), _) =>
      (l.exprId == a1.exprId && r.exprId == a2.exprId) ||
        (l.exprId == a2.exprId && r.exprId == a1.exprId)
    case _ => false
  }

  /** finish = identity: acc -> acc. */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  private def isZeroLong(e: Expression): Boolean = e match {
    case Literal(0L, LongType) => true
    case Cast(Literal(0, _), LongType, _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, zipF), zero, mergeF, finishF)
        if isLongArray(a) && isLongArray(b) && isZeroLong(zero) &&
          isPairwiseMultiply(zipF) && isSumMerge(mergeF) && isIdentityFinish(finishF) =>
      // preserve overflow semantics: ANSI Multiply/Add raise on Long
      // overflow, so the native kernel must too when replacing them
      val ansi = (zipF.collectFirst { case m: Multiply => m.evalMode } ++
        mergeF.collectFirst { case ad: Add => ad.evalMode })
        .exists(_ == EvalMode.ANSI)
      DotProductLong(a, b, failOnOverflow = ansi)
  }
}
