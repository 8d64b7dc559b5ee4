package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

import org.apache.spark.sql.graft.ColumnBridge

/** Intersection size of two SORTED `array<long>` columns as a native
  * codegen'd merge-count.
  *
  * This is the dedup exact-verify kernel: a candidate pair's common-shingle
  * count. `size(array_intersect(a, b))` on the string shingle arrays is
  * semantically identical but allocates a hash set of UTF8Strings and
  * re-hashes every n-gram per pair — the dominant cost of q21's verify
  * stage (round-3 verdict). Over pre-sorted 8-byte hashes the same count is
  * one branch-predictable merge loop: no allocation, no string compares,
  * fully inside whole-stage codegen.
  *
  * Inputs MUST be sorted ascending ([[graft.ops.Dedup.shingleSets]] sorts
  * once at build time, amortized over every candidate pair). Duplicate
  * elements are counted pairwise like array_intersect's set semantics only
  * when inputs are distinct — shingle arrays are (array_distinct upstream).
  * Null array → null count (BinaryExpression default).
  */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
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
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi < $yj) { $i++; }
         |  else if ($xi > $yj) { $j++; }
         |  else { $c++; $i++; $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ArrayExprs {
  def sortedLongIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.toColumn(SortedLongIntersectCount(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
}
