package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

import org.apache.spark.sql.graft.ColumnBridge

/** Deflate compression ratio of a text column — the classic
  * repetitiveness signal (Gopher/MassiveText-style quality filtering uses
  * it alongside the n-gram repetition fractions): heavily templated or
  * looping text compresses far below ~0.4, natural prose sits well above.
  * Complements [[graft.ops.TextAnalysis]]'s repetition metrics, which
  * count EXACT n-gram repeats — deflate also catches approximate and
  * long-range redundancy the fixed-n windows miss.
  *
  * ratio = deflate(utf8 bytes, level, nowrap) / raw byte length; null for
  * null or empty text (no bytes, no ratio).
  *
  * Row-local and shuffle-free; the deflater is thread-local and reset per
  * row (allocating one per row measurably dominates). Deliberately NOT
  * oracle-able: the ratio depends on the zlib build, so it is pinned by
  * specs (determinism, ordering between repetitive and diverse text, the
  * ~1.0 incompressible bound) rather than a cross-engine replay — same
  * evidence discipline as the streaming operators.
  *
  * CodegenFallback: the per-row work is a zlib pass over the whole text —
  * orders of magnitude above any expression-dispatch overhead, so
  * generated code would buy nothing (the [[NGramShingles]] precedent).
  */
case class DeflateRatio(child: Expression, level: Int)
    extends UnaryExpression with CodegenFallback {

  require(level >= 1 && level <= 9, s"deflate level must be 1..9, got $level")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "deflate_ratio"

  @transient private lazy val deflater =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(level, true)
    }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.length == 0) return null
    val d = deflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    total.toDouble / bytes.length
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CompressExprs {
  def deflateRatio(text: Column, level: Int = 6): Column =
    ColumnBridge.toColumn(DeflateRatio(ColumnBridge.toExpr(text), level))
}
