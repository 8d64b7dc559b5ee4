package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

import org.apache.spark.sql.graft.ColumnBridge

/** Membership probe against a BROADCAST [[BloomFilter]] sketch — the
  * row-local half of the Bloom dedup layer
  * ([[graft.ops.Dedup.bloomSnapshot]] builds the sketch).
  *
  * Why an expression and not a UDF/mapPartitions: the probe sits on the
  * ingest hot path (every new document, every batch), and as a native
  * codegen'd expression it stays inside whole-stage codegen — one filter
  * reference per plan (`addReferenceObj` in generated code), one
  * `mightContainBinary` call per row, no boxing, no Scala-function
  * bridge.
  *
  * Why the expression holds a `Broadcast` HANDLE and not the bytes: an
  * expression's fields serialize with the plan into EVERY task. A
  * 100 M-fingerprint snapshot at 1% fpp is ~120 MB — embedded bytes
  * would ship it per task closure; the broadcast handle is a few bytes
  * per task and executors fetch the sketch blocks once via torrent
  * broadcast, exactly like a broadcast-joined dim. The filter itself
  * deserializes once per executor inside the broadcast.
  *
  * The probe hashes the value's UTF-8 BYTES (the same bytes
  * `DataFrameStatFunctions.bloomFilter` inserts for a string column), so
  * build and probe agree byte-for-byte. One-sided error: `true` may be a
  * false positive (rate ≈ the build's `fpp`); `false` is definitive.
  */
case class BloomMightContain(child: Expression, bloom: Broadcast[BloomFilter])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.value.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[Broadcast[BloomFilter]].getName + s"<${classOf[BloomFilter].getName}>")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ((${classOf[BloomFilter].getName}) $ref.value()).mightContainBinary($c.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

object BloomExprs {
  /** `true` iff the string column's bytes might be in the sketch. The
    * serialized sketch is broadcast ONCE here; the returned column's
    * plan carries only the handle. */
  def mightContain(value: Column, bloomBytes: Array[Byte]): Column = {
    val spark = SparkSession.active
    val bc = spark.sparkContext.broadcast(
      BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes)))
    ColumnBridge.toColumn(BloomMightContain(ColumnBridge.toExpr(value), bc))
  }
}
