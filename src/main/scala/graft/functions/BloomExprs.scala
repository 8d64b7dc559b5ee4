package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

import org.apache.spark.sql.graft.ColumnBridge

/** Membership probe against a serialized [[BloomFilter]] sketch — the
  * row-local half of the Bloom dedup layer
  * ([[graft.ops.Dedup.bloomSnapshot]] builds the sketch).
  *
  * Why an expression and not a UDF/mapPartitions: the probe sits on the
  * ingest hot path (every new document, every batch), and as a native
  * codegen'd expression it stays inside whole-stage codegen — one
  * deserialized filter per plan (lazy, shared by reference in generated
  * code via `addReferenceObj`), one `mightContainBinary` call per row,
  * no boxing, no Scala-function bridge.
  *
  * The probe hashes the value's UTF-8 BYTES (the same bytes
  * `DataFrameStatFunctions.bloomFilter` inserts for a string column), so
  * build and probe agree byte-for-byte. One-sided error: `true` may be a
  * false positive (rate ≈ the build's `fpp`); `false` is definitive.
  *
  * Cluster note: the serialized sketch rides the plan (executor-broadcast
  * once per stage). A 100 M-fingerprint snapshot at 1% fpp is ~120 MB —
  * the same order as a broadcast-joined dim; size `fpp` accordingly and
  * keep the probe in ONE stage per batch.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomExprs {
  /** `true` iff the string column's bytes might be in the sketch. */
  def mightContain(value: Column, bloomBytes: Array[Byte]): Column =
    ColumnBridge.toColumn(BloomMightContain(ColumnBridge.toExpr(value), bloomBytes))
}
