package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Codegen'd vector quantization — `floor(x · 2^20)` per element,
  * float/double array → BIGINT array. The third bench-gated custom
  * Expression (after [[LongArrayDot]] and SortedIntersectCount):
  * the `transform` HOF formulation is interpreted per element (one
  * lambda invocation and boxing per component — SURVEY's measured
  * HOF trap), and quantize sits at the mouth of EVERY vector-family
  * operator, so the whole corpus pays it once per pass. This compiles
  * to a tight primitive loop returning an UnsafeArrayData.
  *
  * Semantics are bit-identical to the HOF form (widen-exact,
  * exponent-shift multiply, floor — see [[graft.engine.Vec]]):
  * the cross-engine determinism contract is untouched.
  *
  * Null ELEMENTS propagate as nulls (HOF parity) via a boxed slow
  * path; the declared vector operators never produce them, so the
  * hot loop stays primitive.
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType,
    containsNull = child.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "quantize_vec"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any =
    QuantizeVec.quantizeArray(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      // fast path: primitive loop + UnsafeArrayData, falling back to
      // the null-propagating helper the moment a null slot appears
      // (the declared vector paths never hit it; arbitrary SQL can)
      s"""
         |int $n = $a.numElements();
         |long[] $arr = new long[$n];
         |boolean ${arr}_hasNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${arr}_hasNull = true; break; }
         |  $arr[$i] = (long) java.lang.Math.floor($get * 1048576.0D);
         |}
         |${ev.value} = ${arr}_hasNull
         |  ? graft.plans.QuantizeVec.quantizeArray($a, $isFloat)
         |  : org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

object QuantizeVec {
  /** DataFrame-API entry point. */
  def quantize(a: Column): Column =
    ColumnBridge.column(QuantizeVec(ColumnBridge.expression(a)))

  /** Null-propagating quantization, matching the transform-HOF
    * semantics exactly: a null ELEMENT stays null (the codegen fast
    * path cannot represent that in a primitive array, so it defers
    * here on first null). Called from generated code — keep public. */
  def quantizeArray(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    var anyNull = false
    while (i < n) {
      if (a.isNullAt(i)) { out(i) = null; anyNull = true }
      else {
        val d = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        out(i) = math.floor(d * 1048576.0).toLong
      }
      i += 1
    }
    if (anyNull) new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    else UnsafeArrayData.fromPrimitiveArray(out.map(_.asInstanceOf[Long]))
  }
}
