package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** A ∩ B (the ELEMENTS, ascending) for two SORTED, distinct,
  * null-free ARRAY<BIGINT> inputs — [[SortedIntersectCount]]'s
  * sibling for consumers that need the members, not the cardinality
  * (graph_triangles' third corner). One merge walk in codegen into a
  * primitive long buffer; `array_intersect` instead builds a hash set
  * per invocation — measured as the dominant cost of the triangle
  * intersect stage at sf0.1 (1.2M invocations over ~70-element
  * adjacency arrays).
  *
  * Caller contract: inputs come from array_sort of distinct elements
  * — unsorted input silently under-emits, which the parity test pins.
  */
case class SortedIntersectElems(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<BIGINT> arguments")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect_elems"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val buf = new Array[Long](math.min(a.numElements(), b.numElements()))
    var i = 0; var j = 0; var c = 0
    while (i < a.numElements() && j < b.numElements()) {
      val cmp = java.lang.Long.compare(a.getLong(i), b.getLong(j))
      if (cmp == 0) { buf(c) = a.getLong(i); c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(buf, c))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val buf = ctx.freshName("buf")
      s"""
         |long[] $buf = new long[Math.min($a.numElements(), $b.numElements())];
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $a.numElements() && $j < $b.numElements()) {
         |  int $cmp = java.lang.Long.compare($a.getLong($i), $b.getLong($j));
         |  if ($cmp == 0) { $buf[$c] = $a.getLong($i); $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($buf, $c));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectElems =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectElems {
  def elems(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectElems(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
