package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd integer dot product over two ARRAY<BIGINT>
  * columns — the hot kernel of quantized cosine similarity
  * (graft.operators.Similarity).
  *
  * Why a custom Expression (SURVEY.md §7 custom-vs-built-in ladder):
  * the built-in formulation `aggregate(zip_with(a,b,*), 0, +)`
  * allocates an intermediate array and runs the fold through
  * interpreted HigherOrderFunction lambdas per row — at 400k pairs ×
  * 64 dims that interpretation dominates the similarity-search
  * benchmark. This expression compiles to a tight primitive loop
  * inside whole-stage codegen: no allocation, no virtual calls.
  *
  * Semantics are EXACTLY those of the HOF formulation, so the
  * [[RewriteDotProduct]] optimizer rule may substitute it anywhere:
  * null input array → null; arrays of different lengths → null (the
  * HOF zips the shorter with nulls, poisoning the sum); any null
  * element → null; and with failOnOverflow=true (set by the rule
  * when it replaces ANSI-mode arithmetic) overflow raises instead of
  * wrapping, matching ANSI Multiply/Add.
  */
case class DotProductLong(left: Expression, right: Expression,
                          failOnOverflow: Boolean = false)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      if (failOnOverflow)
        s = java.lang.Math.addExact(s, java.lang.Math.multiplyExact(x.getLong(i), y.getLong(i)))
      else s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val acc =
        if (failOnOverflow)
          s"$s = java.lang.Math.addExact($s, java.lang.Math.multiplyExact($a.getLong($i), $b.getLong($i)));"
        else s"$s += $a.getLong($i) * $b.getLong($i);"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)

  override def flatArguments: Iterator[Any] = Iterator(left, right)
}
