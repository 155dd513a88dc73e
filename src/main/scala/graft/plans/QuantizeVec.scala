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
  * Precondition (guaranteed by the embeddings loader): null-free
  * array elements.
  */
case class QuantizeVec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<FLOAT|DOUBLE>, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "quantize_vec"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Long](n)
    var i = 0
    if (isFloat)
      while (i < n) {
        out(i) = math.floor(a.getFloat(i).toDouble * 1048576.0).toLong; i += 1
      }
    else
      while (i < n) {
        out(i) = math.floor(a.getDouble(i) * 1048576.0).toLong; i += 1
      }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      val get = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      s"""
         |int $n = $a.numElements();
         |long[] $arr = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $arr[$i] = (long) java.lang.Math.floor($get * 1048576.0D);
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

object QuantizeVec {
  /** DataFrame-API entry point. */
  def quantize(a: Column): Column =
    ColumnBridge.column(QuantizeVec(ColumnBridge.expression(a)))
}
