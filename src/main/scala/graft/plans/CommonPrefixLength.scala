package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd longest-common-prefix LENGTH (in characters) of
  * two STRING columns — the adjacency kernel of the suffix-order
  * repeated-substring panel (graft.operators.SuffixRank / q250).
  *
  * Why a custom Expression (SURVEY.md §7 custom-vs-built-in ladder):
  * there is no built-in LCP; the composable form
  * `size(filter(transform(sequence(1, n), k -> substr(a,1,k) = substr(b,1,k)), x -> x))`
  * re-materializes O(n) substrings per row (O(n^2) char copies). The
  * kernel is a single byte scan over the two UTF8String buffers with
  * zero allocation inside whole-stage codegen.
  *
  * UTF-8 correctness: the result counts CHARACTERS, not bytes. The
  * common byte prefix of two valid UTF-8 strings can end in the
  * middle of a multi-byte character (two different code points
  * sharing lead bytes); the scan therefore backs up over trailing
  * continuation bytes (0b10xxxxxx) to the last complete character
  * boundary before counting lead bytes. On pure-ASCII input (the
  * document corpus — chars 32..121) bytes == chars and the back-up
  * never fires. Null in → null out.
  */
case class CommonPrefixLength(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two STRING arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_lcp"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    val n = math.min(x.numBytes(), y.numBytes())
    var l = 0
    while (l < n && x.getByte(l) == y.getByte(l)) l += 1
    // back up to a character boundary: if the differing byte position
    // falls inside a multi-byte char of x, that char differs from
    // y's, so the common CHAR prefix ends at the char's start. (When
    // l == numBytes of the shorter string we are at a clean boundary
    // of that string by validity.)
    if (l < x.numBytes()) {
      while (l > 0 && (x.getByte(l) & 0xC0) == 0x80) l -= 1
    }
    var chars = 0
    var i = 0
    while (i < l) {
      if ((x.getByte(i) & 0xC0) != 0x80) chars += 1
      i += 1
    }
    chars
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val l = ctx.freshName("l")
      val i = ctx.freshName("i")
      val chars = ctx.freshName("chars")
      s"""
         |int $n = java.lang.Math.min($a.numBytes(), $b.numBytes());
         |int $l = 0;
         |while ($l < $n && $a.getByte($l) == $b.getByte($l)) $l++;
         |if ($l < $a.numBytes()) {
         |  while ($l > 0 && (($a.getByte($l) & 0xC0) == 0x80)) $l--;
         |}
         |int $chars = 0;
         |for (int $i = 0; $i < $l; $i++) {
         |  if (($a.getByte($i) & 0xC0) != 0x80) $chars++;
         |}
         |${ev.value} = $chars;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CommonPrefixLength =
    copy(left = newLeft, right = newRight)
}
