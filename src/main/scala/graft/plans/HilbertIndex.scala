package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd 2-D Hilbert-curve index (Hilbert 1891; the
  * iterative xy2d formulation popularized by Warren, "Hacker's
  * Delight" §16 / the classic Wikipedia routine) — the
  * locality-clustering upgrade over the Morton interleave
  * (operators.Zorder, q233): consecutive Hilbert indices are always
  * GRID-ADJACENT (Manhattan distance 1), where the Z-curve jumps
  * across the plane at every power-of-two boundary. Layout sorted by
  * this value gives multi-dimensional range scans strictly better
  * worst-case file-skipping locality, which is why modern
  * lakehouse clustering (e.g. Delta liquid clustering) prefers
  * Hilbert over Z.
  *
  * `bits` fixes the per-coordinate resolution (index spans
  * [0, 4^bits)); coordinates are masked to `bits` like Zorder.zvalue
  * masks its inputs. The per-row cost is a `bits`-iteration integer
  * loop inside whole-stage codegen — no allocation, no branching
  * beyond the rotation conditionals.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (bits < 1 || bits > 31)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName bits must be in [1, 31], got $bits")
    else if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT coordinates, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_hilbert"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val mask = (1L << bits) - 1
    var x = a.asInstanceOf[Long] & mask
    var y = b.asInstanceOf[Long] & mask
    var s = 1L << (bits - 1)
    var d = 0L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      val mask = (1L << bits) - 1
      s"""
         |long $x = $a & ${mask}L;
         |long $y = $b & ${mask}L;
         |long $d = 0L;
         |for (long $s = ${1L << (bits - 1)}L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
