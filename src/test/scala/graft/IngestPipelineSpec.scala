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

  test("standing-index gate sinks probe each microbatch against the stores; per-batch dirs replay-idempotent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.{CacheScope, Dedup, Similarity}
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    CacheScope.withScope { scope =>
      // --- text layer: the fuzzy rung of the front door ---
      val ndIdx = tmp("gate-ndidx"); val ndOut = tmp("gate-ndout"); val ck1 = tmp("gate-ck1")
      val hist = (0 until 12).map(i =>
        (i.toLong, s"shared template words number ${i % 3} tail marker ${i % 3}"))
        .toDF("doc_id", "text")
      Dedup.saveNearDupIndex(Dedup.buildNearDupIndex(hist, "doc_id", "text",
        k = 4, rowsPerBand = 2, n = 5, scope = scope), ndIdx)
      val mem = MemoryStream[(Long, String)]
      val q = EventStream.nearDupGateSink(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", ndIdx, ndOut, ck1, minJaccard = 0.2, scope = scope)
      val b1 = Seq((100L, "shared template words number 0 tail marker 0"),
        (101L, "completely unrelated content xyzzy plugh quux"))
      val b2 = Seq((102L, "shared template words number 1 tail marker 1"))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      q.stop()
      def got(b: Int) = spark.read.parquet(s"$ndOut/batch=$b")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      def want(rows: Seq[(Long, String)]) =
        Dedup.incrementalNearDupsWith(rows.toDF("doc_id", "text"),
            Dedup.loadNearDupIndex(spark, ndIdx, scope), "doc_id", "text",
            minJaccard = 0.2, scope = scope)
          .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got(0) == want(b1) && got(0).map(_._1) == Seq(100L),
        "the template echo matches history, the junk doc does not")
      assert(got(1) == want(b2) && got(1).nonEmpty,
        "each microbatch gets its own verdict dir against the same cached index")

      // --- vector layer: the embed rung, same shape ---
      val emIdx = tmp("gate-emidx"); val emOut = tmp("gate-emout"); val ck2 = tmp("gate-ck2")
      def vec(i: Int) = Seq(math.cos(i * 0.7), math.sin(i * 0.7), 0.1 * (i % 3), 0.5)
      Similarity.saveEmbedIndex(Similarity.buildEmbedIndex(
        (0 until 20).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding"),
        "vec_id", "embedding", dim = 4, nPlanes = 3, scope = scope), emIdx)
      val mem2 = MemoryStream[(Long, Seq[Double])]
      val q2 = EventStream.embedGateSink(mem2.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", emIdx, emOut, ck2, minSim = 0.999, scope = scope)
      mem2.addData((99L, vec(7))); q2.processAllAvailable()
      q2.stop()
      val gotEm = spark.read.parquet(s"$emOut/batch=0")
        .as[(Long, Long, Double)].collect().toSeq
      assert(gotEm.exists(r => r._1 == 99L && r._2 == 7L),
        "the echoed vector must match its historical source through the stream gate")

      // multi-probe twin: the widened probe streams == the batch
      // multiProbe path, store untouched (probe-only contract)
      val emOut2 = tmp("gate-emout2"); val ck3 = tmp("gate-ck3")
      val mem3 = MemoryStream[(Long, Seq[Double])]
      val q3 = EventStream.embedGateSink(mem3.toDF().toDF("vec_id", "embedding"),
        "vec_id", "embedding", emIdx, emOut2, ck3, minSim = 0.5,
        multiProbe = true, scope = scope)
      val b3 = Seq((99L, vec(7)), (98L, vec(11)))
      mem3.addData(b3: _*); q3.processAllAvailable()
      q3.stop()
      val gotMp = spark.read.parquet(s"$emOut2/batch=0")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      val wantMp = Similarity.incrementalEmbedNearDupsWith(
          b3.toDF("vec_id", "embedding"),
          Similarity.loadEmbedIndex(spark, emIdx, scope),
          "vec_id", "embedding", minSim = 0.5, multiProbe = true)
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(gotMp == wantMp && gotMp.nonEmpty)
      Seq(ndIdx, ndOut, ck1, emIdx, emOut, ck2, emOut2, ck3).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    }
  }

  test("phashGateSink: binary payloads probe the standing perceptual store per microbatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.{CacheScope, Multimodal}
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    CacheScope.withScope { scope =>
      val idx = tmp("gate-phidx"); val out = tmp("gate-phout"); val ck = tmp("gate-phck")
      val words = Seq("alpha", "Bravo", "chi", "DELTA", "echo2",
        "foxtrot", "Golf77", "hotel", "IndiaInk", "julietX")
      def mkText(i: Int): String =
        (0 until 60 + (i % 7) * 5).map { k =>
          words((((i + 1) * 2654435761L + k * 40503L + i.toLong * k * 97L) % 10).toInt)
        }.mkString(" ")
      val hist = Multimodal.packBinary(
        (0 until 20).map(i => (i.toLong, mkText(i))).toDF("doc_id", "t"), "doc_id", "t")
      Multimodal.savePHashIndex(
        Multimodal.buildPHashIndex(hist, "doc_id", "payload", nBands = 4, scope = scope), idx)
      val mem = MemoryStream[(Long, String)]
      val stream = mem.toDF().toDF("doc_id", "t")
        .select(col("doc_id"), encode(col("t"), "utf-8").as("payload"))
      val q = EventStream.phashGateSink(stream, "doc_id", "payload",
        idx, out, ck, maxDist = 6, multiProbe = true, scope = scope)
      // batch 0: a first-byte mutant of doc 7 (must match 7) + junk
      val b1 = Seq((107L, "X" + mkText(7).drop(1)),
        (200L, "totally unrelated stream content xyzzy plugh quux foo bar"))
      mem.addData(b1: _*); q.processAllAvailable()
      // batch 1: an exact echo of doc 3 in its own verdict dir
      mem.addData((103L, mkText(3))); q.processAllAvailable()
      q.stop()
      val g0 = spark.read.parquet(s"$out/batch=0")
        .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
      assert(g0.map(r => (r._1, r._2)) == Seq((107L, 7L)) && g0.head._3 <= 1,
        s"the mutant matches its original, the junk doc does not: $g0")
      val g1 = spark.read.parquet(s"$out/batch=1")
        .as[(Long, Long, Int)].collect().toSeq
      assert(g1 == Seq((103L, 3L, 0)))
      // ≡ the batch probe path (probe-only: the store is unchanged)
      val want = Multimodal.incrementalPerceptualDupsWith(
          Multimodal.packBinary(b1.toDF("doc_id", "t"), "doc_id", "t"),
          Multimodal.loadPHashIndex(spark, idx, scope),
          "doc_id", "payload", maxDist = 6, multiProbe = true)
        .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
      assert(g0 == want)
      assert(spark.read.parquet(s"$idx/pbands").count() == 20L * 4)
      Seq(idx, out, ck).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    }
  }

  test("frameGateSink: clip payloads probe the standing frame store per microbatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.{CacheScope, Multimodal}
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    CacheScope.withScope { scope =>
      val idx = tmp("gate-fridx"); val out = tmp("gate-frout"); val ck = tmp("gate-frck")
      def block(s: Int): String =
        (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
      def clip(i: Int): String =
        (0 until 4).map(f => block(1 + (i * 7 + f * 3) % 40)).mkString
      val hist = Multimodal.packBinary(
        (0 until 12).map(i => (i.toLong, clip(i))).toDF("doc_id", "t"), "doc_id", "t")
      Multimodal.saveFrameIndex(Multimodal.buildFrameIndex(hist, "doc_id",
        "payload", frameBytes = 128, stride = 128, maxFrames = 4, nBands = 4,
        scope = scope), idx)
      val mem = MemoryStream[(Long, String)]
      val stream = mem.toDF().toDF("doc_id", "t")
        .select(col("doc_id"), encode(col("t"), "utf-8").as("payload"))
      val q = EventStream.frameGateSink(stream, "doc_id", "payload",
        idx, out, ck, maxDist = 2, minMatchedFrames = 3, scope = scope)
      // batch 0: clip 5 with its LAST frame re-shot (3 aligned matches)
      // + a clip the store has never seen
      val b1 = Seq((105L, clip(5).take(384) + block(50)),
        (200L, clip(30)))
      mem.addData(b1: _*); q.processAllAvailable()
      // batch 1: an exact echo of clip 2 in its own verdict dir
      mem.addData((102L, clip(2))); q.processAllAvailable()
      q.stop()
      val g0 = spark.read.parquet(s"$out/batch=0")
        .as[(Long, Long, Long, Int)].collect().toSeq
      assert(g0 == Seq((105L, 5L, 3L, 0)),
        s"the edited clip matches its original on 3 frames, the new clip drops: $g0")
      val g1 = spark.read.parquet(s"$out/batch=1")
        .as[(Long, Long, Long, Int)].collect().toSeq
      assert(g1 == Seq((102L, 2L, 4L, 0)))
      // ≡ the batch probe path (probe-only: the store is unchanged)
      val want = Multimodal.incrementalFrameDupsWith(
          Multimodal.packBinary(b1.toDF("doc_id", "t"), "doc_id", "t"),
          Multimodal.loadFrameIndex(spark, idx, scope),
          "doc_id", "payload", maxDist = 2, minMatchedFrames = 3)
        .as[(Long, Long, Long, Int)].collect().toSeq
      assert(g0 == want)
      assert(spark.read.parquet(s"$idx/fbands").count() == 12L * 4 * 4)
      Seq(idx, out, ck).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    }
  }

  test("phashGateSink over a DECODED-founded store: streamed JPEG twins match their PNG history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.{CacheScope, Multimodal}
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def img(fmt: String, shift: Int): Array[Byte] = {
      val (w, h) = (63, 48)
      val bi = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = ((((x * 9) / w) * 37 + ((y * 8) / h) * 71) + shift * 53) % 200
        bi.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, fmt, out)
      out.toByteArray
    }
    CacheScope.withScope { scope =>
      val idx = tmp("gate-phdec-idx"); val out = tmp("gate-phdec-out")
      val ck = tmp("gate-phdec-ck")
      // the store is FOUNDED decoded (round-12 verdict #1); the sink
      // loads the founding marker and hashes every microbatch decoded —
      // no sink-side knob to get wrong
      val hist = (0 until 10).map(i => (i.toLong, img("png", i)))
        .toDF("doc_id", "payload")
      Multimodal.savePHashIndex(Multimodal.buildPHashIndex(hist, "doc_id",
        "payload", nBands = 4, decoder = Multimodal.ImageioDecoder,
        scope = scope), idx)
      val mem = MemoryStream[(Long, Array[Byte])]
      val stream = mem.toDF().toDF("doc_id", "payload")
      val q = EventStream.phashGateSink(stream, "doc_id", "payload",
        idx, out, ck, maxDist = 4, scope = scope)
      // a JPEG re-encode of image 6 — the pair the stub space provably
      // misses (ImageDecodeSpec) — plus an unrelated image (the
      // INVERTED pattern, ~64 bits from every shift variant: shift
      // deltas can land close in luma space, so "unrelated" must be
      // structural, not another shift) and garbage
      def imgInv(fmt: String): Array[Byte] = {
        val (w, h) = (63, 48)
        val bi = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) {
          val v = 199 - ((((x * 9) / w) * 37 + ((y * 8) / h) * 71) % 200)
          bi.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        val o2 = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(bi, fmt, o2)
        o2.toByteArray
      }
      val b = Seq((106L, img("jpg", 6)), (200L, imgInv("png")),
        (201L, "not an image".getBytes))
      mem.addData(b: _*); q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(s"$out/batch=0")
        .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
      assert(got.size == 1 && got.head._1 == 106L && got.head._2 == 6L &&
        got.head._3 <= 2, s"got $got")
      // ≡ the batch probe path
      val want = Multimodal.incrementalPerceptualDupsWith(
          b.toDF("doc_id", "payload"),
          Multimodal.loadPHashIndex(spark, idx, scope),
          "doc_id", "payload", maxDist = 4)
        .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
      assert(got == want)
      Seq(idx, out, ck).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    }
  }

  test("frameGateSink over a WAV-founded store: streamed recordings probe in PCM space") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.{CacheScope, Multimodal}
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def block(s: Int): Array[Byte] =
      Array.tabulate(128)(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toByte)
    def rec(i: Int): Array[Byte] =
      (0 until 4).flatMap(f => block(1 + (i * 7 + f * 3) % 40).toSeq).toArray
    CacheScope.withScope { scope =>
      val idx = tmp("gate-wav-idx"); val out = tmp("gate-wav-out")
      val ck = tmp("gate-wav-ck")
      val hist = (0 until 10).map(i =>
          (i.toLong, Multimodal.packWav(rec(i), withListChunk = (i % 2 != 0))))
        .toDF("doc_id", "payload")
      Multimodal.saveFrameIndex(Multimodal.buildFrameIndex(hist, "doc_id",
        "payload", frameBytes = 128, stride = 128, maxFrames = 4, nBands = 4,
        decoder = Multimodal.WavDecoder, scope = scope), idx)
      val mem = MemoryStream[(Long, Array[Byte])]
      val stream = mem.toDF().toDF("doc_id", "payload")
      val q = EventStream.frameGateSink(stream, "doc_id", "payload",
        idx, out, ck, maxDist = 2, minMatchedFrames = 3, scope = scope)
      // recording 5 with its last block re-taken, in the OTHER header
      // layout (no LIST chunk where 5 has one) — the RIFF walk makes
      // header layout irrelevant; plus a recording the store never saw
      val edited = rec(5).take(384) ++ block(50)
      val b = Seq((104L, Multimodal.packWav(edited)),
        (200L, Multimodal.packWav(rec(30))))
      mem.addData(b: _*); q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(s"$out/batch=0")
        .as[(Long, Long, Long, Int)].collect().toSeq
      assert(got == Seq((104L, 5L, 3L, 0)), s"got $got")
      Seq(idx, out, ck).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    }
  }

  test("audioGateSink: arrival-time clip/silence verdicts per microbatch, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.Multimodal
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val out = tmp("gate-audout"); val ck = tmp("gate-audck")
    val healthy = Array.tabulate[Byte](200)(j => (1 + ((37 + j * 17) % 250)).toByte)
    val mem = MemoryStream[(Long, Array[Byte])]
    val stream = mem.toDF().toDF("doc_id", "payload")
    val q = EventStream.audioGateSink(stream, "doc_id", out, ck)
    val b0 = Seq((0L, Multimodal.packWav(healthy)),
      (1L, Multimodal.packWav(Array.fill[Byte](100)(128.toByte))), // dead air
      (2L, healthy))                                               // not a WAV
    mem.addData(b0: _*); q.processAllAvailable()
    mem.addData((3L, Multimodal.packWav(Array.fill[Byte](80)(255.toByte))))
    q.processAllAvailable()
    q.stop()
    val g0 = spark.read.parquet(s"$out/batch=0")
      .as[(Long, Boolean, Long, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(g0(0L)._6 && g0(0L)._2, "the healthy recording keeps")
    assert(!g0(1L)._6 && g0(1L)._5 == 1.0, "dead air drops")
    assert(!g0(2L)._2 && !g0(2L)._6, "not-a-WAV audits invalid")
    val g1 = spark.read.parquet(s"$out/batch=1")
      .as[(Long, Boolean, Long, Double, Double, Boolean)].collect().toSeq
    assert(g1.map(_._1) == Seq(3L) && !g1.head._6 && g1.head._4 == 1.0,
      "the clipped rail drops in its own batch dir")
    // ≡ the batch gate
    val want = Multimodal.wavQualityGate(b0.toDF("doc_id", "payload"), "doc_id")
      .as[(Long, Boolean, Long, Double, Double, Boolean)].collect().toSet
    assert(g0.values.toSet == want)
    Seq(out, ck).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
  }

  test("integrityGateSink: arrival-time payload verdicts per microbatch, stateless") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.Multimodal
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val out = tmp("gate-intout"); val ck = tmp("gate-intck")
    val mem = MemoryStream[(Long, String, Long)]
    // the stream carries packed rows; doc 2's payload is truncated AFTER
    // the meta was captured (badLen simulates the failed transfer)
    val stream = mem.toDF().toDF("doc_id", "t", "badLen")
      .select(col("doc_id"),
        expr("substring(encode(t, 'utf-8'), 1, cast(badLen as int))").as("payload"),
        struct(lit("fake/raw").as("format"),
          octet_length(encode(col("t"), "utf-8")).cast("long").as("byte_len"),
          md5(encode(col("t"), "utf-8")).as("content_hash")).as("meta"))
    val q = EventStream.integrityGateSink(stream, "doc_id", out, ck)
    mem.addData((1L, "healthy payload body", 20L), (2L, "this one truncates", 5L))
    q.processAllAvailable()
    mem.addData((3L, "second batch fine", 17L))
    q.processAllAvailable()
    q.stop()
    val g0 = spark.read.parquet(s"$out/batch=0")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(g0 == Map(1L -> "ok", 2L -> "truncated"))
    val g1 = spark.read.parquet(s"$out/batch=1")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(g1 == Map(3L -> "ok"))
    // ≡ the batch path on the same rows
    val batchWant = Multimodal.payloadIntegrity(
        Multimodal.packBinary(Seq((1L, "healthy payload body")).toDF("doc_id", "t"),
          "doc_id", "t"), "doc_id")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(batchWant(1L) == "ok")
    Seq(out, ck).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
  }

  test("ingestGateSink: the composed front door per microbatch == batch quality + ingestGate, verdicts unified") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.{CacheScope, Dedup, Pipeline, TextAnalysis}
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    CacheScope.withScope { scope =>
      val snapDir = tmp("fd-snap"); val idxDir = tmp("fd-idx")
      val out = tmp("fd-out"); val ck = tmp("fd-ck")
      // history: both standing stores founded batch-side (the sink is
      // probe-only — the maintenance loop owns extension)
      val hist = (0 until 12).map(i =>
        (i.toLong, s"the shared template words and number ${i % 3} tail marker ${i % 3}"))
        .toDF("doc_id", "text")
      Dedup.appendSnapshot(spark, snapDir,
        hist.select(col("doc_id"), graft.ops.TextAnalysis.fingerprint(col("text")).as("fp")),
        "doc_id")
      Dedup.saveNearDupIndex(Dedup.buildNearDupIndex(hist, "doc_id", "text",
        k = 4, rowsPerBand = 2, n = 5, scope = scope), idxDir)

      val fresh = "the completely fresh document body and sentence marker alpha beta"
      val b1 = Seq(
        (100L, "the shared template words and number 1 tail marker 1"), // dup_history
        (101L, fresh),                                                  // kept
        (102L, fresh),                                                  // dup_batch (same fp as 101)
        (104L, "too short and the"))                                    // low_quality (4 words)
      val b2 = Seq(
        (105L, "the shared template words and number 2 tail marker 9"), // near_dup (echo, last word differs)
        (106L, "the wholly unrelated survey answers and quarterly totals appendix")) // kept

      val mem = MemoryStream[(Long, String)]
      val q = EventStream.ingestGateSink(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", snapDir, idxDir, out, ck,
        minJaccard = 0.2, quality = true, minWords = 5, scope = scope)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      q.stop()

      // the batch-mode composition the sink must reproduce, per batch
      def want(rows: Seq[(Long, String)]): Seq[(Long, String)] = {
        val b = rows.toDF("doc_id", "text")
        val bad = TextAnalysis.gopherQualityGate(b, "doc_id", "text", minWords = 5)
          .filter(col("gopher_ok") === 0).select(col("doc_id"))
        val gated = b.join(bad, Seq("doc_id"), "left_anti")
        val snap = Dedup.snapshotLive(spark, snapDir, "doc_id").select(col("fp"))
        val idx = Dedup.loadNearDupIndex(spark, idxDir, scope)
        Pipeline.ingestGate(gated, "doc_id", "text", snap, idx, 0.2, scope)
          .unionByName(bad.select(col("doc_id"), lit("low_quality").as("verdict"),
            when(lit(false), col("doc_id")).as("hist_id"),
            lit(null).cast("double").as("jaccard")))
          .select("doc_id", "verdict").as[(Long, String)].collect().sortBy(_._1).toSeq
      }
      def got(b: Int): Seq[(Long, String)] = spark.read.parquet(s"$out/batch=$b")
        .select("doc_id", "verdict").as[(Long, String)].collect().sortBy(_._1).toSeq

      assert(got(0) == want(b1), "batch 0 must equal the batch-mode front door")
      assert(got(1) == want(b2), "batch 1 must equal the batch-mode front door")
      // and the ladder's rungs all actually fire across the two batches
      val verdicts = (got(0) ++ got(1)).map(_._2).toSet
      assert(verdicts == Set("dup_history", "dup_batch", "kept", "low_quality", "near_dup"),
        s"every rung must decide at least one doc, got $verdicts")
      Seq(snapDir, idxDir, out, ck).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    }
  }

  test("ivfPq gate sink serves ranked matches per microbatch from the standing index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.{CacheScope, Similarity}
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    def vecs(ids: Range) = ids.map { i =>
      (i.toLong, (0 until 8).map(j => math.cos(i * 0.37 + j * 1.1)).toSeq)
    }
    CacheScope.withScope { scope =>
      val dir = tmp("gate-pqidx"); val out = tmp("gate-pqout"); val ck = tmp("gate-pqck")
      val corpus = vecs(4 until 44).toDF("vec_id", "emb")
      val cents = corpus.select(col("vec_id").as("_cid"),
        col("emb").cast("array<double>").as("_cv")).orderBy("_cid").limit(4)
      val book = Similarity.pqBookConst(8, 2, 4)
      Similarity.saveIvfPqIndex(Similarity.buildIvfPqIndex(corpus, "vec_id",
        "emb", cents, book, dim = 8, scope = scope), dir)
      val mem = MemoryStream[(Long, Seq[Double])]
      val q = EventStream.ivfPqGateSink(mem.toDF().toDF("vec_id", "emb"),
        "vec_id", "emb", dir, out, ck, nProbe = 2, topK = 3, scope = scope)
      val b1 = vecs(0 until 3); val b2 = vecs(44 until 46)
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      q.stop()
      // each microbatch's verdict dir equals the batch-mode standing
      // search over the same rows — the serving loop, per trigger
      val idx = Similarity.loadIvfPqIndex(spark, dir, scope)
      def got(b: Int) = spark.read.parquet(s"$out/batch=$b")
        .orderBy("query_id", "vec_id").as[(Long, Long, Double)].collect().toSeq
      def want(rows: Seq[(Long, Seq[Double])]) =
        Similarity.ivfPqTopKWith(idx, rows.toDF("vec_id", "emb"),
            "vec_id", "emb", nProbe = 2, topK = 3)
          .orderBy("query_id", "vec_id").as[(Long, Long, Double)].collect().toSeq
      assert(got(0) == want(b1) && got(0).map(_._1).distinct.size == 3,
        "every arriving vector gets its ranked matches")
      assert(got(1) == want(b2) && got(1).nonEmpty,
        "each trigger probes the same standing coded table")
      Seq(dir, out, ck).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    }
  }

  test("ingestGateSink repetition + normalized identity: rungs and marker guard") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.{CacheScope, Dedup, TextAnalysis}
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    CacheScope.withScope { scope =>
      val snapDir = tmp("fdn-snap"); val idxDir = tmp("fdn-idx")
      val out = tmp("fdn-out"); val ck = tmp("fdn-ck")
      // history founded NORMALIZED (the batch-maintenance side owns the
      // marker; the sink only enforces it). Docs carry 30 distinct
      // filler words: short docs trivially fire the top-2-gram rule
      // (a count-1 gram of two long words can exceed 20% of the chars),
      // which is exactly why the PAPER pairs this gate with the >= 50
      // word quality rule
      val fill = (0 until 30).map(i => f"wd$i%03d").mkString(" ")
      val hist = Seq((0L, s"The shared template, words AND number 7! $fill"))
        .toDF("doc_id", "text")
      val histN = hist.withColumn("text", TextAnalysis.normalizeForDedup(col("text")))
      Dedup.foundSnapshotFpKind(spark, snapDir, "normalized")
      Dedup.foundSnapshotFpKind(spark, idxDir, "normalized")
      Dedup.appendSnapshot(spark, snapDir,
        histN.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")),
        "doc_id")
      Dedup.saveNearDupIndex(Dedup.buildNearDupIndex(histN, "doc_id", "text",
        k = 4, rowsPerBand = 2, n = 5, scope = scope), idxDir)

      val spam = "the and" + " abc def" * 30 // gopher-ok, repetition-fail
      val fill2 = (0 until 30).map(i => f"vx$i%03d").mkString(" ")
      val b1 = Seq(
        (10L, s"THE shared template; words and number 5 $fill"), // normalized class of history -> dup_history
        (11L, spam),                                             // repetitive
        (12L, "and the"),                                        // low_quality (2 words)
        (13L, s"the wholly unrelated quarterly survey answers and appendix totals $fill2"))
      val mem = MemoryStream[(Long, String)]
      val q = EventStream.ingestGateSink(mem.toDF().toDF("doc_id", "text"),
        "doc_id", "text", snapDir, idxDir, out, ck,
        minJaccard = 0.2, quality = true, minWords = 5,
        repetition = true, normalize = true, scope = scope)
      mem.addData(b1: _*); q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(s"$out/batch=0")
        .select("doc_id", "verdict").as[(Long, String)].collect().toMap
      assert(got == Map(10L -> "dup_history", 11L -> "repetitive",
        12L -> "low_quality", 13L -> "kept"))

      // starting a RAW sink against the normalized stores fails loudly
      val mem2 = MemoryStream[(Long, String)]
      val e = intercept[IllegalArgumentException] {
        EventStream.ingestGateSink(mem2.toDF().toDF("doc_id", "text"),
          "doc_id", "text", snapDir, idxDir, out, tmp("fdn-ck2"),
          scope = scope)
      }
      assert(e.getMessage.contains("normalized"))
      Seq(snapDir, idxDir, out, ck).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    }
  }

  test("mediaIngestGate: escalating rungs — integrity first, audio quality, then the standing perceptual probe") {
    import graft.ops.{CacheScope, Multimodal, Pipeline}
    def block(s: Int): String =
      (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
    CacheScope.withScope { scope =>
      // ---- stub space: an image-ish corpus ----
      val hist = Multimodal.packBinary(
        (0 until 4).map(i => (i.toLong, block(10 + i) * 3)).toDF("doc_id", "t"),
        "doc_id", "t")
      val idx = Multimodal.buildPHashIndex(hist, "doc_id", "payload",
        nBands = 4, scope = scope)
      val packed = Multimodal.packBinary(Seq(
        (100L, "Z" + (block(10) * 3).drop(1)), // near history -> dup_history
        (101L, block(40) * 3),                 // new -> kept
        (102L, block(41) * 3),                 // will truncate
        (103L, block(42) * 3),                 // will corrupt in place
        (104L, block(43) * 3)                  // blob never arrives
      ).toDF("doc_id", "t"), "doc_id", "t")
      val tampered = packed.withColumn("payload",
        when(col("doc_id") === 102L, expr("substring(payload, 1, 10)"))
          .when(col("doc_id") === 103L,
            concat(encode(lit("~"), "utf-8"), expr("substring(payload, 2)")))
          .when(col("doc_id") === 104L, lit(null).cast("binary"))
          .otherwise(col("payload")))
      val got = Pipeline.mediaIngestGate(tampered, "doc_id", idx,
          maxDist = 6, scope = scope)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), Option(r.get(2)))).toMap
      assert(got(100L)._1 == "dup_history" && got(100L)._2 == Some(0L))
      assert(got(101L) == (("kept", None)))
      assert(got(102L) == (("truncated", None)))
      assert(got(103L) == (("corrupted", None)))
      assert(got(104L) == (("missing", None)))

      // ---- wav space with the audio rung: a recordings corpus ----
      def packWavRow(rows: Seq[(Long, Array[Byte])]) = {
        import org.apache.spark.sql.functions.{struct => fstruct}
        rows.toDF("doc_id", "payload").select(col("doc_id"), col("payload"),
          fstruct(lit("audio/wav").as("format"),
            octet_length(col("payload")).cast("long").as("byte_len"),
            md5(col("payload")).as("content_hash")).as("meta"))
      }
      val pcm0 = (block(1) * 3).getBytes("UTF-8")
      val wavHist = packWavRow(Seq(0L -> Multimodal.packWav(pcm0)))
      val idxW = Multimodal.buildPHashIndex(wavHist, "doc_id", "payload",
        nBands = 4, decoder = Multimodal.WavDecoder, scope = scope)
      val wavBatch = packWavRow(Seq(
        // same pcm, different container layout -> dup_history in wav space
        200L -> Multimodal.packWav(pcm0, withListChunk = true),
        201L -> Multimodal.packWav(Array.fill[Byte](300)(128.toByte)), // dead air
        202L -> Multimodal.packWav((block(50) * 3).getBytes("UTF-8"))))
      val gotW = Pipeline.mediaIngestGate(wavBatch, "doc_id", idxW,
          maxDist = 2, audioGate = true, scope = scope)
        .collect().map(r => r.getLong(0) ->
          (r.getString(1), Option(r.get(2)))).toMap
      assert(gotW(200L)._1 == "dup_history" && gotW(200L)._2 == Some(0L),
        "identical pcm pairs across container layouts")
      assert(gotW(201L) == (("low_quality", None)), "dead air never reaches the probe")
      assert(gotW(202L) == (("kept", None)))
    }
  }

  test("storyboardGateSink: re-containered cuts verdict dup_history; within-batch dups elect the lowest id") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    import graft.ops.{CacheScope, Dedup, Multimodal, TextAnalysis}
    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    CacheScope.withScope { scope =>
      val snap = tmp("gate-sbsnap"); val out = tmp("gate-sbout"); val ck = tmp("gate-sbck")
      def block(s: Int): String =
        (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
      // found the storyboard snapshot through the BATCH loop's identity:
      // fp = fingerprint(storyboard) — exactly what `scenes --emit
      // boards` piped into `dedup --text-col storyboard` founds
      val hist = Multimodal.packBinary(
        Seq((0L, block(1) * 2 + block(2))).toDF("doc_id", "t"), "doc_id", "t")
      Dedup.appendSnapshot(spark, snap,
        Multimodal.storyboardFingerprints(hist, "doc_id", "payload")
          .select(col("doc_id"),
            TextAnalysis.fingerprint(col("storyboard")).as("fp")),
        "doc_id")
      val mem = MemoryStream[(Long, String)]
      val stream = mem.toDF().toDF("doc_id", "t")
        .select(col("doc_id"), encode(col("t"), "utf-8").as("payload"))
      val q = EventStream.storyboardGateSink(stream, "doc_id", "payload",
        snap, out, ck, scope = scope)
      mem.addData(
        // the history cut re-uploaded with a tail append AND extra
        // within-scene padding: raw bytes differ, the storyboard doesn't
        (100L, block(1) * 3 + block(2) + "JUNK"),
        (101L, block(3) + block(4)),          // a new cut
        (102L, block(3) + block(4) + "TAIL")) // its own within-batch twin
      q.processAllAvailable()
      q.stop()
      val got = spark.read.parquet(s"$out/batch=0")
        .as[(Long, String)].collect().toMap
      assert(got == Map(100L -> "dup_history", 101L -> "kept",
        102L -> "dup_batch"))
      Seq(snap, out, ck).foreach(p =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
    }
  }

}
