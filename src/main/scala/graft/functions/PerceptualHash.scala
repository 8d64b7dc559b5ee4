package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

import org.apache.spark.sql.graft.ColumnBridge

/** Perceptual difference hash (dHash) over a binary media payload as a
  * NATIVE codegen'd expression: the 64-bit signature whose Hamming
  * distance is small for perceptually-near payloads — the binary-column
  * twin of the text side's SimHash rung.
  *
  * Real dHash (the image-dedup standard: resize to a 9×8 grayscale grid,
  * set bit (r,c) when the right cell is brighter than the left) lives in
  * `Multimodal.dHashImage` (JDK `javax.imageio` decode → 2-D grid). THIS
  * expression is the byte-stream flavor — exactly like
  * `Multimodal.decodeStub` (the q68 discipline) — where the DECODE step is a
  * deterministic fake: the payload's bytes ARE the luma samples. The
  * perceptual structure is real and stays: downsample the byte stream
  * into 72 = 9×8 cell MEANS (cell of byte j = j·72/len — a localized
  * edit moves a few cell means slightly; a byte-rotation re-bins every
  * cell), then 64 horizontal brightness comparisons pack into one long:
  * bit r·8+c set iff cell[r·9+c+1] > cell[r·9+c]. Swapping in a real
  * decoder means replacing the byte stream with decoded luma — the grid,
  * comparison and packing stay byte-for-byte.
  *
  * Cross-engine exactness (the gate oracle replays this in DuckDB from
  * `hex(payload)` byte arithmetic): cell means are exact-integer sums
  * divided as IEEE doubles, absent cells (len < 72) compare as 0.0, and
  * the empty payload hashes to 0. The hash is ONE pass over the bytes +
  * a constant 72-slot scratch, inside whole-stage codegen — at 100 TB
  * this runs in the scan stage, and only 8-byte signatures shuffle.
  */
case class DHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "dhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val p = input.asInstanceOf[Array[Byte]]
    DHash64.hash(p)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DHash64 {

  /** The reference arithmetic — called from both the interpreted path and
    * the generated code, so the two cannot drift. */
  def hash(p: Array[Byte]): Long = {
    val len = p.length
    if (len == 0) return 0L
    val sum = new Array[Long](72)
    val cnt = new Array[Long](72)
    var j = 0
    while (j < len) {
      val cell = ((j.toLong * 72L) / len).toInt
      sum(cell) += (p(j) & 0xff)
      cnt(cell) += 1
      j += 1
    }
    var h = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val i0 = r * 9 + c
        val a = if (cnt(i0) > 0) sum(i0).toDouble / cnt(i0) else 0.0
        val b = if (cnt(i0 + 1) > 0) sum(i0 + 1).toDouble / cnt(i0 + 1) else 0.0
        if (b > a) h |= (1L << (r * 8 + c))
        c += 1
      }
      r += 1
    }
    h
  }

  def dhash64(payload: Column): Column =
    ColumnBridge.toColumn(DHash64(ColumnBridge.toExpr(payload)))
}
