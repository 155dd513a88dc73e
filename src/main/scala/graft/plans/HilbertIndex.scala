package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of an (x, y) cell on the 256×256 grid — the
  * second multi-dimension layout key beside ZOrder, as a native
  * codegen'd Expression: the classic xy2d bit walk (8 fixed
  * iterations of quadrant pick + reflect/transpose rotation) runs
  * unrolled-loop-free inside WholeStageCodegen, no UDF boxing.
  *
  * Why a second curve: Z-order's bit interleave has axis-crossing
  * JUMPS (cell 0x0FF→0x100 teleports across half the plane), so a
  * file's z-range can cover two distant rectangles; the Hilbert walk
  * moves one cell per step, giving strictly adjacent file ranges —
  * measurably tighter min/max pruning envelopes on range predicates,
  * which is why table formats offer both. Caller contract: inputs
  * already reduced to [0, 255] (the layout query's `% 256` — same
  * domain as ZOrder's 8-bit interleave).
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two BIGINT arguments")

  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    var x = l.asInstanceOf[Long]
    var y = r.asInstanceOf[Long]
    var d = 0L
    var s = 128L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (long $s = 128L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    if ($rx == 1) { $x = $s - 1 - $x; $y = $s - 1 - $y; }
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

object HilbertIndex {
  def key(x: Column, y: Column): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))
}
