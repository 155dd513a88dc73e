package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Codegen'd rolling 4-byte gram extraction — BINARY →
  * ARRAY<BIGINT> of big-endian 4-byte window values (r16, guide
  * §1.2/§4.1: prefer codegen over interpreted per-element paths).
  * The fourth bench-gated custom Expression (LongArrayDot /
  * SortedIntersect* / QuantizeVec precedent): multimodal_near_dup's
  * gram stage ran a `transform(sequence(...), i -> ...)` HOF —
  * interpreted per element with boxing (the measured HOF trap) —
  * over every payload byte of the corpus. This compiles to one
  * primitive loop per payload returning an UnsafeArrayData.
  *
  * Semantics are bit-identical to the SQL formulation
  * `transform(sequence(1, length(p) - 3), i ->
  *   CAST(conv(hex(substring(p, i, 4)), 16, 10) AS BIGINT))`
  * on any input (big-endian unsigned byte composition; inputs
  * shorter than 4 bytes yield an empty array — callers filter them
  * first, as the declared query does). ByteGrams4Spec pins the
  * equality.
  */
case class ByteGrams4(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BINARY, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "byte_grams4"

  override protected def nullSafeEval(v: Any): Any =
    ByteGrams4.grams(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions." +
        s"UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.plans.ByteGrams4.gramsRaw($b));")

  override protected def withNewChildInternal(newChild: Expression): ByteGrams4 =
    copy(child = newChild)
}

object ByteGrams4 {
  /** DataFrame-API entry point. */
  def grams4(c: Column): Column =
    ColumnBridge.column(ByteGrams4(ColumnBridge.expression(c)))

  def gramsRaw(b: Array[Byte]): Array[Long] = {
    val n = if (b.length < 4) 0 else b.length - 3
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
        ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
      i += 1
    }
    out
  }

  def grams(b: Array[Byte]): UnsafeArrayData =
    UnsafeArrayData.fromPrimitiveArray(gramsRaw(b))
}
