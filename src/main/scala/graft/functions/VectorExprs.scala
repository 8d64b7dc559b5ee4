package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

import org.apache.spark.sql.graft.ColumnBridge

/** Dot product of two `array<double>` columns as a NATIVE codegen'd
  * expression.
  *
  * The composable form — `aggregate(zip_with(a, b, (x, y) => x * y), 0.0,
  * (acc, x) => acc + x)` — is semantically identical but evaluates
  * interpreted: higher-order functions walk an expression tree per element,
  * which dominated the embedding-similarity hot path in round 1 (verdict:
  * "a 64-dim dot product per row should not cost this"). This expression
  * compiles to a tight scalar loop inside whole-stage codegen.
  *
  * Summation is sequential left-to-right — the SAME float associativity as
  * the `aggregate` fold and the generated DuckDB oracle SQL, so projection
  * signs (LSH bucket bits) agree bit-for-bit.
  *
  * Null contract: null array → null result (BinaryExpression default);
  * lengths may differ — the shorter length bounds the loop (the fold's
  * zip_with would null-pad instead, but every caller guarantees equal
  * dims). Null ELEMENTS are not supported (embeddings are dense).
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encode as a NATIVE codegen'd expression: the
  * m×k×(dim/m) codebook rides along as ONE reference object (a flattened
  * `double[]` — index metadata, kilobytes) and the nearest-centroid search
  * is a tight three-level loop.
  *
  * The composable form this replaces — m unrolled `array(...)` distance
  * trees of k·(dim/m) scalar terms each, ~512 leaves at (64,4,8) — was
  * semantically identical but made CATALYST the bottleneck: every query
  * touching an encode (q65–q67, q69) paid seconds of analysis +
  * optimization + codegen on a tree whose size scales with k·dim, before
  * a single row moved. Here the expression tree is one node regardless of
  * codebook size, and per-row work compiles to the same scalar loop
  * inside whole-stage codegen.
  *
  * Bit-exactness vs the unrolled form (and the DuckDB oracle): each
  * sub-distance is a left-to-right sum of squared terms — the loop's
  * `acc += t*t` chain associates identically to the unrolled
  * `reduce(_ + _)` (a leading `0.0 +` is exact: squared doubles are
  * non-negative, and `0.0 + x == x` for every non-negative x). The argmin
  * is first-min via strict `<`, exactly `array_position(dists,
  * array_min(dists))` for NaN-free distances.
  *
  * Null contract: null array → null (UnaryExpression default). Null
  * elements unsupported (embeddings are dense — same contract as
  * [[DotProduct]]). Vectors shorter than dim raise, matching ANSI
  * `element_at`'s out-of-bounds behavior in the form it replaces.
  */
case class PqEncode(child: Expression, book: Array[Array[Array[Double]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private val m  = book.length
  private val k  = book(0).length
  private val sd = book(0)(0).length
  private val dim = m * sd

  // flattened [(s*k + c)*sd + j] layout: one flat primitive array keeps
  // the codegen reference object simple and the inner loop stride-1
  @transient private lazy val flat: Array[Double] = {
    val out = new Array[Double](m * k * sd)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        System.arraycopy(book(s)(c), 0, out, (s * k + c) * sd, sd)
        c += 1
      }
      s += 1
    }
    out
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() < dim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${v.numElements()} elements, codebook needs $dim")
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        var d = 0.0
        var j = 0
        val base = s * sd
        val boff = (s * k + c) * sd
        while (j < sd) {
          val t = v.getDouble(base + j) - flat(boff + j)
          d += t * t
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bookRef = ctx.addReferenceObj("pqBook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s"); val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val best = ctx.freshName("best"); val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d"); val t = ctx.freshName("t")
      s"""
         |if ($v.numElements() < $dim) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: vector has " + $v.numElements() + " elements, codebook needs $dim");
         |}
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $d = 0.0;
         |    for (int $j = 0; $j < $sd; $j++) {
         |      double $t = $v.getDouble($s * $sd + $j) - $bookRef[($s * $k + $c) * $sd + $j];
         |      $d += $t * $t;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExprs {
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.toColumn(DotProduct(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))

  def pqEncode(vec: Column, book: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.toColumn(PqEncode(ColumnBridge.toExpr(vec),
      book.map(_.map(_.toArray).toArray).toArray))
}
