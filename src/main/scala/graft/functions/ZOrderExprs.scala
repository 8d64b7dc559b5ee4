package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

import org.apache.spark.sql.graft.ColumnBridge

/** Morton (Z-order) key: interleave the low `bits` bits of two long
  * columns — x on even bit positions, y on odd — producing a single long
  * whose ordering clusters rows that are close in BOTH dimensions.
  *
  * This is the data-layout operator behind multi-dimensional file
  * clustering (Delta/Iceberg `ZORDER BY`): writing a 100 TB table
  * range-partitioned and sorted by the Morton key of its two hottest
  * filter columns makes parquet row-group min/max stats selective on
  * EITHER column, so scans with a predicate on just one of them still
  * prune most files — a plain sort by (x, y) only prunes on x.
  *
  * A native codegen'd expression: the interleave is `bits` iterations of
  * shift/mask/or in a tight int loop, fully inside whole-stage codegen.
  * Composing it from built-ins costs 2·bits shift/and/shiftleft Column
  * expressions and a `bits`-term sum — semantically identical (the spec
  * pins equivalence) but a much larger expression tree. Negative inputs
  * are masked, not rejected: only the low `bits` bits participate, so
  * callers bucket/modulo their dimensions first.
  */
case class InterleaveBits(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 32, s"bits must be in [1,32], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < $bits; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZOrderExprs {
  /** Morton key of the low `bits` bits of `x` and `y` (cast to long). */
  def interleaveBits(x: Column, y: Column, bits: Int): Column =
    ColumnBridge.toColumn(InterleaveBits(
      ColumnBridge.toExpr(x.cast("long")), ColumnBridge.toExpr(y.cast("long")), bits))
}
