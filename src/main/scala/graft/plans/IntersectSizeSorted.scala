package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen'd intersection SIZE of two SORTED-DISTINCT
  * ARRAY<BIGINT> columns — the hot kernel of exact Jaccard
  * verification (graft.operators.Dedup.verifyJaccard, which backs
  * q46/q77/q86/q93/q105/q122/q166).
  *
  * Why a custom Expression (SURVEY.md §7 custom-vs-built-in ladder):
  * `size(array_intersect(a, b))` builds a per-row hash set AND
  * materializes the intersection array, only for `size` to throw the
  * elements away. Candidate verification needs the COUNT alone, and
  * [[graft.operators.Dedup]]'s shingle arrays are ascending-sorted
  * and duplicate-free by construction (java.util.Arrays.sort on
  * distinct), so a two-pointer merge scan gets the count with zero
  * allocation inside whole-stage codegen.
  *
  * PRECONDITION: both inputs ascending-sorted, duplicate-free. On
  * unsorted input the count is undefined — the caller owns the
  * invariant (IntersectSizeSortedSpec pins equivalence with
  * array_intersect on sorted-distinct inputs). Null array → null;
  * a null ELEMENT (cannot occur in primitive-sourced shingle
  * arrays, checked defensively) → null.
  */
case class IntersectSizeSorted(left: Expression, right: Expression)
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
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      if (x.isNullAt(i) || y.isNullAt(j)) return null
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $n && $j < $m) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv < $yv) { $i++; }
         |  else if ($xv > $yv) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |if (!${ev.isNull}) ${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSizeSorted =
    copy(left = newLeft, right = newRight)

  override def flatArguments: Iterator[Any] = Iterator(left, right)
}
