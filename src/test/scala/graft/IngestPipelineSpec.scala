package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** The full streaming ingest FRONT DOOR, composed end-to-end: Bloom gate
  * (history dedup, zero I/O) → within-stream watermarked dedup →
  * stateless quality gate → checkpoint-recoverable packing sink — every
  * stage an existing proven operator, this spec proves they COMPOSE and
  * that the result equals the equivalent batch pipeline over the same
  * documents, across a mid-stream restart. */
class IngestPipelineSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  test("bloom gate -> stream dedup -> quality gate -> packing sink == batch pipeline, across a restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("ingest").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ingestck").toString

    // history: already-ingested docs the bloom gate must keep out
    val history = (0 until 30).map(i => (i.toLong, s"historic doc $i body text here"))
      .toDF("id", "text")
    val bloom = graft.ops.Dedup.bloomSnapshot(history, "text",
      expectedItems = 100, fpp = 0.0001)

    // arrivals: history dups + in-stream dups + junk + good docs
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    val arrivals = Seq(
      (100L, "historic doc 3 body text here", ts(1)),   // bloom-dropped
      (101L, "a fresh document with enough tokens one", ts(2)),
      (102L, "a fresh document with enough tokens one", ts(3)), // in-stream dup
      (103L, "short", ts(4)),                           // quality-dropped
      (104L, "another fresh document with enough tokens two", ts(5)),
      (105L, "historic doc 17 body text here", ts(6)),  // bloom-dropped
      (106L, "third fresh document with enough tokens three", ts(7)),
      (107L, "fourth fresh document with enough tokens four", ts(8)))

    def pipeline(stream: org.apache.spark.sql.DataFrame) = {
      val gated = EventStream.bloomGateStream(stream, "text", bloom)
      val deduped = EventStream.dedupStream(
        gated.withColumn("fp0", graft.ops.TextAnalysis.fingerprint(col("text"))),
        "ts", Seq("fp0"), watermark = "10 minutes")
      EventStream.qualityGate(deduped, "text", minTokens = 5)
        .select(col("id"), col("text"))
    }

    val mem = MemoryStream[(Long, String, Timestamp)]
    val q1 = EventStream.packingSink(pipeline(mem.toDF().toDF("id", "text", "ts")),
      "id", "text", seqLen = 8, out, ckpt)
    mem.addData(arrivals.take(4): _*)
    q1.processAllAvailable()
    q1.stop() // mid-stream restart: offsets + dedup state must recover
    val q2 = EventStream.packingSink(pipeline(mem.toDF().toDF("id", "text", "ts")),
      "id", "text", seqLen = 8, out, ckpt)
    mem.addData(arrivals.drop(4): _*)
    q2.processAllAvailable()
    q2.stop()

    // batch equivalent: same gates as plain batch ops over the survivors
    val survivors = Seq(
      (101L, "a fresh document with enough tokens one"),
      (104L, "another fresh document with enough tokens two"),
      (106L, "third fresh document with enough tokens three"),
      (107L, "fourth fresh document with enough tokens four"))
    val batchPack = graft.ops.TextAnalysis.sequencePack(
        survivors.toDF("id", "text"), "id", "text", seqLen = 8)
      .select(col("id"), col("n_tokens"), col("start_off"), col("seq_first"), col("seq_last"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    val streamed = spark.read.parquet(out)
      .select(col("id"), col("n_tokens"), col("start_off"), col("seq_first"), col("seq_last"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(streamed.toSeq == batchPack.toSeq,
      "the composed streaming front door must reproduce the batch pipeline")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(ckpt))
  }
}
