package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

import org.apache.spark.sql.graft.ColumnBridge

/** RIFF-aware PCM extraction from a WAV payload as a NATIVE codegen'd
  * expression: the audio rung's decode step. Unlike the image side —
  * where real decode needs a library reader behind `mapPartitions` —
  * WAV/PCM is a header walk: the samples are IN the byte stream, so
  * extraction stays a scan-stage expression and the downstream
  * perceptual machinery ([[DHash64]] over fixed-duration sample
  * windows, the banded Hamming join) is REAL signal processing, not a
  * stub over container bytes. Hashing the raw container instead would
  * bind header layout (chunk order, metadata chunks, fmt variants)
  * into the signature: two byte-identical recordings saved by two
  * tools would never match.
  *
  * The walk is the RIFF spec's: `RIFF` + LE32 size + `WAVE`, then
  * chunks of 4-byte id + LE32 size (word-aligned — odd sizes carry a
  * pad byte) until the `data` chunk; its payload (clamped to the bytes
  * actually present — a truncated transfer behaves like a shorter
  * recording, [[graft.ops.Multimodal.payloadIntegrity]] names the
  * damage) is the result. Anything that is not a well-formed
  * RIFF/WAVE prefix — or has no `data` chunk — extracts EMPTY, which
  * yields zero frames downstream: the pairing rungs drop the payload
  * exactly like an undecodable image. Chunk sizes are read unsigned
  * into longs, so a hostile 0xFFFFFFFF size cannot wrap the cursor
  * (the same overflow discipline as `splitImageFrames`).
  */
case class WavPcm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_pcm"

  override protected def nullSafeEval(input: Any): Any =
    WavPcm.extract(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WavPcm.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WavPcm {

  private val Empty = new Array[Byte](0)

  /** The fmt-chunk facts + the data payload's (offset, clamped length)
    * — what [[graft.ops.Multimodal.extractWavFeatures]] and
    * [[graft.ops.Multimodal.wavQualityGate]] audit. `info.isDefined`
    * IS the validity contract both audit rungs share: a well-formed
    * RIFF/WAVE carrying both an fmt and a data chunk, in either order
    * (the spec mandates fmt first, but a lenient reader must not call
    * a payload [[extract]] happily processes invalid). */
  final case class WavInfo(sampleRate: Int, channels: Int,
                           bitsPerSample: Int, dataOff: Int, dataLen: Int)

  /** Parse the fmt and data chunks (same walk as [[extract]]); None
    * when the payload is not a well-formed RIFF/WAVE prefix or lacks
    * either chunk. The data length clamps to the bytes present — a
    * truncated transfer audits as a shorter recording. */
  def info(b: Array[Byte]): Option[WavInfo] = {
    if (b == null || b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return None
    var off = 12L
    var fmt: Option[(Int, Int, Int)] = None
    var data: Option[(Int, Int)] = None
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val o = off.toInt
      val size = le32(b, o + 4)
      if (tag(b, o, "fmt ") && size >= 16 && off + 8 + 16 <= b.length) {
        val channels = ((b(o + 10) & 0xff)) | ((b(o + 11) & 0xff) << 8)
        val rate = le32(b, o + 12).toInt
        val bits = ((b(o + 22) & 0xff)) | ((b(o + 23) & 0xff) << 8)
        fmt = Some((rate, channels, bits))
      } else if (tag(b, o, "data") && data.isEmpty) {
        val start = off + 8
        data = Some((start.toInt, math.min(size, b.length - start).toInt))
      }
      off += 8 + size + (size & 1)
    }
    for ((r, c, bits) <- fmt; (doff, dlen) <- data)
      yield WavInfo(r, c, bits, doff, dlen)
  }

  private def tag(b: Array[Byte], off: Int, t: String): Boolean =
    (b(off) & 0xff) == t.charAt(0) && (b(off + 1) & 0xff) == t.charAt(1) &&
      (b(off + 2) & 0xff) == t.charAt(2) && (b(off + 3) & 0xff) == t.charAt(3)

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  /** The reference walk — shared by the interpreted and generated
    * paths, so the two cannot drift. Never null: not-a-WAV extracts
    * empty (zero frames downstream). */
  def extract(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE"))
      return Empty
    var off = 12L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val size = le32(b, o + 4)
      if (tag(b, o, "data")) {
        val start = off + 8
        val take = math.min(size, b.length - start)
        return java.util.Arrays.copyOfRange(b, start.toInt, (start + take).toInt)
      }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    Empty
  }

  def wavPcm(payload: Column): Column =
    ColumnBridge.toColumn(WavPcm(ColumnBridge.toExpr(payload)))
}
