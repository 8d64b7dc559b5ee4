package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video payloads as opaque `binary`
  * columns beside a typed metadata struct, with feature extraction running
  * batched per partition.
  *
  * The Spark-side plumbing — schema, partitioning, batch shape — is real and
  * tested; the codec itself is STUBBED with a deterministic fake (this
  * environment has no image/audio libraries). Swap `decodeStub` for a real
  * decoder (JNI/javacv/etc.) without touching the plumbing.
  */
object Multimodal {

  /** media metadata struct carried beside the payload */
  val MetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("byte_len", LongType),
    StructField("content_hash", StringType)))

  /** Wrap a string column as an opaque binary payload + metadata struct
    * (stand-in for reading real media bytes). */
  def packBinary(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val bin = encode(col(payloadCol), "utf-8")
    df.select(col(idCol),
      bin.as("payload"),
      struct(lit("fake/raw").as("format"), octet_length(bin).cast("long").as("byte_len"),
        md5(bin).as("content_hash")).as("meta"))
  }

  /** Frame sampling over a binary payload: fixed-size byte windows at a
    * fixed stride, capped at `maxFrames` per row — the video-keyframe /
    * audio-clip sampling shape. Pure column expressions (`substr` on
    * binary is codegen'd), so sampling runs INSIDE the scan stage and only
    * the sampled frames — not whole payloads — flow into downstream
    * decode. Returns `array<struct<frame_idx: int, frame: binary>>`;
    * payloads shorter than one frame yield an empty array. */
  def sampleFrames(payload: org.apache.spark.sql.Column,
                   frameBytes: Int, stride: Int, maxFrames: Int): org.apache.spark.sql.Column = {
    require(frameBytes > 0 && stride > 0 && maxFrames > 0, "positive frame params")
    val n = octet_length(payload)
    val available = greatest(
      floor((n - frameBytes).cast("double") / stride).cast("int") + 1, lit(0))
    val nf = least(available, lit(maxFrames))
    when(nf > 0,
      transform(sequence(lit(0), nf - 1), i => struct(
        i.cast("int").as("frame_idx"),
        substr(payload, i * stride + 1, lit(frameBytes)).as("frame"))))
      .otherwise(array().cast("array<struct<frame_idx:int,frame:binary>>"))
  }

  final case class MediaFeature(id: Long, width: Int, height: Int, channels: Int, brightness: Double)

  /** STUB decoder — deterministic fake deriving pseudo-dimensions from the
    * payload bytes. Replace with a real image decode; the signature (bytes →
    * features) and the partition-batched driver below are the real contract. */
  def decodeStub(id: Long, payload: Array[Byte]): MediaFeature = {
    val len = payload.length
    val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xff))
    MediaFeature(id, width = 64 + len % 577, height = 64 + (len * 31) % 577,
      channels = 3, brightness = (sum % 256).toDouble / 255.0)
  }

  /** Feature extraction over the payloads, batched per partition (the shape
    * a vectorized/pandas-style UDF would take): one decoder instance per
    * partition, records streamed through it. */
  def extractFeatures(packed: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    packed.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would initialize the real codec here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
      .toDF()
  }
}
