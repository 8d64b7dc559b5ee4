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

  /** Perceptual difference hash of a binary payload — 64-bit signature,
    * small Hamming distance ⇔ perceptually near ([[graft.functions.DHash64]];
    * the decode step is the q68 deterministic stub, the grid/compare/pack
    * structure is real dHash). Native codegen'd: runs in the scan stage,
    * only 8-byte signatures leave it. */
  def dHash(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.DHash64.dhash64(payload)

  /** Hamming distance between two [[dHash]] signatures (0–64). */
  def dHashDistance(a: org.apache.spark.sql.Column,
                    b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bit_count(a.bitwiseXOR(b)).cast("int")

  /** Perceptual near-dup pairs over a binary payload column — the
    * multimodal rung beside the text side's eleven: all payload pairs
    * within Hamming distance `maxDist` of each other's [[dHash]], found
    * WITHOUT an all-pairs pass.
    *
    * Candidate generation is the banded Hamming-ball trick the text side
    * already uses for MinHash/SimHash (split the 64-bit signature into
    * `nBands` equal bit-bands; two signatures within Hamming distance
    * < nBands MUST agree exactly on at least one band — pigeonhole — so
    * candidates come from a band-value EQUI-JOIN, never a cross join).
    * Distances in [nBands, maxDist] are found only when a band happens
    * to agree — the standard LSH recall trade, identical on the oracle
    * side because the gate replays the same banding.
    *
    * Scale shape: signatures are computed once in the scan stage (8
    * bytes/row), the band frame is `nBands` rows × ~24 bytes, and the
    * equi-join shuffles on (band, value) — at 100 TB only signature
    * slivers move, payloads never do. `maxPerBucket` caps pathological
    * buckets (a constant-payload flood collides everywhere): keep the
    * `maxPerBucket` LOWEST ids per bucket, a deterministic skew bound —
    * same discipline as the MinHash banding cap. Returns
    * (id_a, id_b, dist), id_a < id_b, each pair once. */
  def perceptualDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                         maxDist: Int = 6, nBands: Int = 4,
                         maxPerBucket: Int = 0): DataFrame = {
    require(nBands >= 2 && 64 % nBands == 0,
      s"nBands must be >= 2 and divide 64, got $nBands")
    require(maxDist >= 0 && maxDist <= 64, s"maxDist in [0,64], got $maxDist")
    val bandBits = 64 / nBands
    val mask = (1L << bandBits) - 1
    val sig = df.select(col(idCol).as("_id"), dHash(col(payloadCol)).as("_sig"))
    val banded = sig.select(col("_id"), col("_sig"),
      explode(array((0 until nBands).map(b => struct(
        lit(b).as("_b"),
        shiftright(col("_sig"), b * bandBits).bitwiseAND(lit(mask)).as("_v"))): _*)).as("_band"))
      .select(col("_id"), col("_sig"),
        col("_band._b").as("_b"), col("_band._v").as("_v"))
    val capped =
      if (maxPerBucket <= 0) banded
      else banded.withColumn("_rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("_b"), col("_v")).orderBy(col("_id"))))
        .filter(col("_rn") <= maxPerBucket).drop("_rn")
    val a = capped.select(col("_b"), col("_v"),
      col("_id").as("id_a"), col("_sig").as("_sa"))
    val b = capped.select(col("_b"), col("_v"),
      col("_id").as("id_b"), col("_sig").as("_sb"))
    a.join(b, Seq("_b", "_v"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        dHashDistance(col("_sa"), col("_sb")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
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
