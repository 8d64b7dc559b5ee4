package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WavPcm
import graft.ops.Multimodal

/** The AUDIO rung (round-13): RIFF-aware PCM extraction as a native
  * scan-stage expression, then the shared frame-perceptual machinery
  * over fixed-duration sample windows. Unlike the image side the signal
  * is REAL — PCM samples are in the byte stream, no codec library
  * needed — so the whole rung is exact and (for the gate corpus, where
  * pcm == document bytes) DuckDB-oracle-able (q201). Reference:
  * carrot-transform has no media surface; the RIFF walk is the public
  * WAVE container spec. */
class WavSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  private def pcm(n: Int, seed: Int = 1): Array[Byte] =
    Array.tabulate(n)(j => ((seed * 31 + j * 17 + seed * j) % 251).toByte)

  test("WavPcm.extract: canonical header, LIST chunk, odd-size padding, truncation clamp, hostile sizes") {
    val p = pcm(300)
    // canonical 44-byte header round-trips
    assert(WavPcm.extract(Multimodal.packWav(p)).toSeq == p.toSeq)
    // a LIST metadata chunk before fmt/data is walked over, not assumed away
    assert(WavPcm.extract(Multimodal.packWav(p, withListChunk = true)).toSeq == p.toSeq)
    // word alignment: an ODD-sized chunk carries a pad byte the walk
    // must skip (hand-built: RIFF/WAVE + junk chunk of size 3 + data)
    val out = new java.io.ByteArrayOutputStream()
    def tag(t: String) = t.foreach(c => out.write(c.toInt))
    def le32(v: Int) = { out.write(v & 0xff); out.write((v >> 8) & 0xff)
      out.write((v >> 16) & 0xff); out.write((v >> 24) & 0xff) }
    tag("RIFF"); le32(4 + 8 + 3 + 1 + 8 + 5); tag("WAVE")
    tag("junk"); le32(3); out.write(9); out.write(9); out.write(9); out.write(0) // pad
    tag("data"); le32(5); out.write(Array[Byte](10, 20, 30, 40, 50))
    assert(WavPcm.extract(out.toByteArray).toSeq == Seq[Byte](10, 20, 30, 40, 50))
    // truncated transfer: a data size larger than the bytes present
    // clamps to what's there (the shorter-recording behavior)
    val whole = Multimodal.packWav(p)
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 100)
    assert(WavPcm.extract(cut).toSeq == p.take(200).toSeq)
    // hostile chunk size 0xFFFFFFFF before data: read unsigned, the
    // cursor jumps past the end and extraction is empty — never a wrap
    val h = new java.io.ByteArrayOutputStream()
    def tg(t: String) = t.foreach(c => h.write(c.toInt))
    tg("RIFF"); h.write(Array[Byte](8, 0, 0, 0)); tg("WAVE")
    tg("junk"); h.write(Array.fill[Byte](4)(0xff.toByte))
    tg("data"); h.write(Array[Byte](2, 0, 0, 0)); h.write(7); h.write(7)
    assert(WavPcm.extract(h.toByteArray).isEmpty)
    // not-a-WAV shapes extract EMPTY (zero frames downstream), loudly
    // distinct from null-payload semantics
    assert(WavPcm.extract(null).isEmpty)
    assert(WavPcm.extract(Array.emptyByteArray).isEmpty)
    assert(WavPcm.extract("RIFFxxxxNOPE and then some".getBytes).isEmpty)
    assert(WavPcm.extract(pcm(64)).isEmpty)
    // headers-only (no data chunk) extracts empty
    val noData = Multimodal.packWav(Array.emptyByteArray)
    assert(WavPcm.extract(java.util.Arrays.copyOfRange(noData, 0, 36)).isEmpty)
  }

  test("wavPcm column expression equals the static walk under codegen, inside one scan stage") {
    val rows = Seq(
      (0L, Multimodal.packWav(pcm(300, 1))),
      (1L, Multimodal.packWav(pcm(300, 2), withListChunk = true)),
      (2L, pcm(64, 3)),          // not a WAV
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "payload")
    val got = rows.select(col("id"), Multimodal.wavPcm(col("payload")).as("p"))
      .as[(Long, Array[Byte])].collect().toMap
    assert(got(0L).toSeq == pcm(300, 1).toSeq)
    assert(got(1L).toSeq == pcm(300, 2).toSeq)
    assert(got(2L).isEmpty)
    assert(got(3L) == null) // null payload stays null (UnaryExpression)
  }

  test("frameDupPairsWav: header-layout-independent pairing; trimmed recordings need the shifted rung") {
    // the StandingIndexSpec frame-block recipe (pairwise dHash >= 7)
    def block(s: Int): Array[Byte] =
      Array.tabulate(128)(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toByte)
    def rec(blocks: Int*) = blocks.flatMap(b => block(b).toSeq).toArray
    val rows = Seq(
      // 0 and 1: same first 3 blocks, different header layouts
      (0L, Multimodal.packWav(rec(1, 2, 3, 4))),
      (1L, Multimodal.packWav(rec(1, 2, 3, 9), withListChunk = true)),
      // 2: recording 0 trimmed by one block — aligned rung misses it
      (2L, Multimodal.packWav(rec(2, 3, 4))),
      // 3: unrelated
      (3L, Multimodal.packWav(rec(30, 31))))
      .toDF("doc_id", "payload")
    val aligned = Multimodal.frameDupPairsWav(rows, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8,
        maxDist = 2, minMatchedFrames = 3)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(aligned.keySet == Set(0L -> 1L), s"got $aligned")
    assert(aligned(0L -> 1L) == ((3L, 0)))
    val shifted = Multimodal.frameDupPairsShiftedWav(rows, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8,
        maxDist = 2, minMatchedFrames = 3)
      .as[(Long, Long, Int, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // the trimmed recording assembles at offset +1 with 3 votes
    assert(shifted(0L -> 2L) == ((1, 3L)), s"got $shifted")
    assert(!shifted.contains(0L -> 3L))
  }

  test("perceptualDupPairsWav: identical PCM pairs across header layouts; non-WAVs drop, never collide") {
    def block(s: Int): Array[Byte] =
      Array.tabulate(256)(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toByte)
    val rows = Seq(
      (0L, Multimodal.packWav(block(1))),
      // the SAME samples in the LIST-bearing container: dist 0
      (1L, Multimodal.packWav(block(1), withListChunk = true)),
      (2L, Multimodal.packWav(block(9))),
      // two IDENTICAL non-WAV payloads: both extract empty and DROP —
      // without the drop they'd collide at the empty-PCM signature
      (3L, block(3)), (4L, block(3)))
      .toDF("doc_id", "payload")
    val got = Multimodal.perceptualDupPairsWav(rows, "doc_id", "payload",
        maxDist = 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(got.contains((0L, 1L, 0)), s"got $got")
    assert(!got.exists(p => p._1 >= 3L || p._2 >= 3L),
      s"non-WAV payloads must drop, not pair: $got")
  }

  test("wav-founded PHashIndex: whole-recording store probes in PCM space") {
    import graft.ops.CacheScope
    CacheScope.withScope { scope =>
      def block(s: Int): Array[Byte] =
        Array.tabulate(256)(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toByte)
      val dir = java.nio.file.Files.createTempDirectory("phidx-wav").toString
      val hist = (0 until 8).map(i => (i.toLong, Multimodal.packWav(block(i))))
        .toDF("doc_id", "payload")
      Multimodal.savePHashIndex(Multimodal.buildPHashIndex(hist, "doc_id",
        "payload", nBands = 4, decoder = Multimodal.WavDecoder,
        scope = scope), dir)
      val loaded = Multimodal.loadPHashIndex(spark, dir, scope)
      assert(loaded.decoder == Multimodal.WavDecoder)
      // recording 5's samples in the OTHER header layout probe home at 0
      val probe = Multimodal.incrementalPerceptualDupsWith(
          Seq((105L, Multimodal.packWav(block(5), withListChunk = true)))
            .toDF("doc_id", "payload"),
          loaded, "doc_id", "payload", maxDist = 2)
        .as[(Long, Long, Int)].collect().toSeq
      assert(probe == Seq((105L, 5L, 0)), s"got $probe")
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("extractWavFeatures: fmt facts, sample count, duration, mean amplitude; malformed audits valid=false") {
    val p = pcm(400, 2)
    val whole = Multimodal.packWav(p, sampleRate = 8000)
    val rows = Seq(
      (0L, whole),
      (1L, Multimodal.packWav(p, sampleRate = 16000, withListChunk = true)),
      // truncated transfer: 100 data bytes missing → shorter recording
      (2L, java.util.Arrays.copyOfRange(whole, 0, whole.length - 100)),
      (3L, pcm(64, 9)))                        // not a WAV
      .toDF("doc_id", "payload")
    val got = Multimodal.extractWavFeatures(rows, "doc_id")
      .as[(Long, Boolean, Int, Int, Int, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    val mean = p.foldLeft(0L)((a, b) => a + (b & 0xff)).toDouble / p.length / 255.0
    assert(got(0L) == ((0L, true, 8000, 1, 8, 400L, 400.0 / 8000, mean)))
    // the LIST header is walked over; the doubled rate halves duration
    assert(got(1L) == ((1L, true, 16000, 1, 8, 400L, 400.0 / 16000, mean)))
    // truncation clamps: 300 samples audited, mean over what's present
    assert(got(2L)._6 == 300L && got(2L)._2 &&
      got(2L)._7 == 300.0 / 8000)
    assert(got(3L) == ((3L, false, 0, 0, 0, 0L, 0.0, -1.0)))
    // WavPcm.info alone: fmt facts + the data span (offset 44 for the
    // canonical header)
    assert(graft.functions.WavPcm.info(whole).contains(
      graft.functions.WavPcm.WavInfo(8000, 1, 8, 44, 400)))
    assert(graft.functions.WavPcm.info(pcm(64)).isEmpty)
    // LENIENT order: a container with data BEFORE fmt still audits
    // valid (extract processes its PCM, so the audit must not call it
    // broken — the two rungs share one validity contract)
    val oo = new java.io.ByteArrayOutputStream()
    def t2(t: String) = t.foreach(c => oo.write(c.toInt))
    def l2(v: Int) = { oo.write(v & 0xff); oo.write((v >> 8) & 0xff)
      oo.write((v >> 16) & 0xff); oo.write((v >> 24) & 0xff) }
    t2("RIFF"); l2(4 + 8 + 3 + 24); t2("WAVE")
    t2("data"); l2(3); oo.write(5); oo.write(6); oo.write(7); oo.write(0)
    t2("fmt "); l2(16)
    oo.write(1); oo.write(0); oo.write(1); oo.write(0) // PCM, mono
    l2(4000); l2(4000)
    oo.write(1); oo.write(0); oo.write(8); oo.write(0) // align, bits
    assert(graft.functions.WavPcm.info(oo.toByteArray).contains(
      graft.functions.WavPcm.WavInfo(4000, 1, 8, 20, 3)))
  }

  test("wavQualityGate: clipping and silence fractions exact; thresholds and tol bite; malformed audits") {
    // rail-free by construction: values in [1, 250] — the clip count
    // of the healthy arm and of the half arm's clean half is exactly 0
    val healthy = Array.tabulate[Byte](200)(j =>
      (1 + ((124 + j * 17 + 4 * j) % 250)).toByte)
    val silence = Array.fill[Byte](100)(128.toByte) // midpoint — dead air
    val clipped = Array.fill[Byte](100)(255.toByte) // pinned to the rail
    val half = healthy.take(100) ++ Array.fill[Byte](100)(0.toByte)
    val rows = Seq(
      (0L, Multimodal.packWav(healthy)),
      (1L, Multimodal.packWav(silence, withListChunk = true)),
      (2L, Multimodal.packWav(clipped)),
      (3L, Multimodal.packWav(half)),               // 50% zero-rail
      (4L, pcm(64, 9)),                             // not a WAV
      (5L, Multimodal.packWav(Array.emptyByteArray))) // valid, EMPTY
      .toDF("doc_id", "payload")
    def gate(maxClip: Double, maxSil: Double, tol: Int = 2) =
      Multimodal.wavQualityGate(rows, "doc_id", maxClip, maxSil, tol)
        .as[(Long, Boolean, Long, Double, Double, Boolean)]
        .collect().map(r => r._1 -> r).toMap
    val g = gate(0.2, 0.5)
    val hClip = healthy.count(b => (b & 0xff) == 0 || (b & 0xff) == 255)
    val hSil = healthy.count(b => math.abs((b & 0xff) - 128) <= 2)
    assert(g(0L) == ((0L, true, 200L, hClip.toDouble / 200,
      hSil.toDouble / 200, true)))
    assert(g(1L) == ((1L, true, 100L, 0.0, 1.0, false))) // silence drops
    assert(g(2L) == ((2L, true, 100L, 1.0, 0.0, false))) // clipping drops
    // the half-zeroed arm: clip_frac exactly 0.5 — keep flips with the
    // threshold (<= rule: 0.5 passes at maxClip 0.5, fails below it)
    assert(g(3L)._4 == 0.5 && !g(3L)._6)
    assert(gate(0.5, 0.5)(3L)._6)
    assert(g(4L) == ((4L, false, 0L, -1.0, -1.0, false)))
    // valid but EMPTY recording: well-formed container, zero samples —
    // nothing to train on, nothing to divide by
    assert(g(5L) == ((5L, true, 0L, 0.0, 0.0, false)))
    // a wider silence tolerance is monotone: tol 127 covers [1, 255]
    val g127 = gate(0.2, 0.5, tol = 127)
    val nonZero = healthy.count(b => (b & 0xff) != 0)
    assert(g127(0L)._5 == nonZero.toDouble / 200 && g127(0L)._5 >= g(0L)._5)
  }

  test("perceptualDupRateCurve in the wav space ≡ the stub curve over the raw PCM (pcm == payload bytes)") {
    val texts = Seq((0L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (1L, "the quick brown fox jumps over the lazy dog repeatedly"),
      (2L, "Zhe quick brown fox jumps over the lazy dog repeatedly"),
      (3L, "a completely different document with other words entirely"))
      .toDF("doc_id", "t")
    val ds = Seq(0, 1, 6)
    // WAV containers (mixed header layouts) priced in the wav space…
    val wavCurve = Multimodal.perceptualDupRateCurve(
        Multimodal.packWavCorpus(texts, "doc_id", "t"), "doc_id", "payload",
        maxDists = ds, decoder = Multimodal.WavDecoder)
      .as[(Int, Long, Long, Double)].collect().toSet
    // …must equal the stub curve over the bare PCM bytes: the header
    // walk is the ONLY difference, and it must be invisible
    val stubCurve = Multimodal.perceptualDupRateCurve(
        Multimodal.packBinary(texts, "doc_id", "t"), "doc_id", "payload",
        maxDists = ds)
      .as[(Int, Long, Long, Double)].collect().toSet
    assert(wavCurve == stubCurve && wavCurve.map(_._1) == ds.toSet)
    // the planted dup (0≡1 at dist 0) is priced at every cutoff
    assert(wavCurve.forall { case (_, nd, n, frac) =>
      n == 4L && nd >= 1L && frac == nd.toDouble / 4 })
  }

  test("packWavCorpus: deterministic construction, parity-keyed LIST chunks, pcm == text bytes") {
    val d = Seq((0L, "even header text content here"),
      (1L, "odd header text content here!")).toDF("doc_id", "text")
    val wavs = Multimodal.packWavCorpus(d, "doc_id", "text")
      .as[(Long, Array[Byte])].collect().toMap
    assert(WavPcm.extract(wavs(0L)).toSeq ==
      "even header text content here".getBytes("UTF-8").toSeq)
    assert(WavPcm.extract(wavs(1L)).toSeq ==
      "odd header text content here!".getBytes("UTF-8").toSeq)
    // the odd id's container is the LIST-bearing (longer) header shape
    assert(wavs(1L).length == wavs(0L).length + 20,
      "odd ids carry the 20-byte LIST chunk")
    // determinism: rebuilding yields byte-identical payloads
    val again = Multimodal.packWavCorpus(d, "doc_id", "text")
      .as[(Long, Array[Byte])].collect().toMap
    assert(again(0L).toSeq == wavs(0L).toSeq && again(1L).toSeq == wavs(1L).toSeq)
  }

  test("wavUtterances: maximal non-silent runs, threshold boundary exact, containers and garbage handled") {
    def loud(n: Int) = pcm(n, seed = 3)           // far from the midpoint
    def quiet(n: Int) = Array.fill[Byte](n)(126.toByte) // |126-128| <= 2
    // L S S L L -> utterances (0: f0), (1: f3-f4)
    val body = loud(128) ++ quiet(256) ++ loud(256)
    // exactly 116/128 silent = 0.90625 >= 0.9 -> silent;
    // 115/128 = 0.8984 -> non-silent (the boundary is the quotient)
    val border116 = quiet(116) ++ loud(12)
    val border115 = quiet(115) ++ loud(13)
    val rows = Seq(
      (0L, Multimodal.packWav(body)),
      (1L, Multimodal.packWav(body, withListChunk = true)), // layout variance
      (2L, Multimodal.packWav(quiet(384))),                 // all silent
      (3L, "notawav".getBytes("UTF-8")),                    // extracts empty
      (4L, Multimodal.packWav(loud(128) ++ border116 ++ loud(128))),
      (5L, Multimodal.packWav(loud(128) ++ border115 ++ loud(128)))
    ).toDF("doc_id", "payload")
    val got = Multimodal.wavUtterances(rows, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8,
        silenceTol = 2, minSilentFrac = 0.9)
      .as[(Long, Int, Int, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.toSeq.sortBy(_._2)).toMap
    for (id <- Seq(0L, 1L))
      assert(got(id) == Seq((id, 0, 0, 0, 1L), (id, 1, 3, 4, 2L)),
        s"clip $id: the silence run splits two utterances")
    assert(!got.contains(2L), "an all-silent recording yields no utterances")
    assert(!got.contains(3L), "not-a-WAV extracts empty")
    assert(got(4L) == Seq((4L, 0, 0, 0, 1L), (4L, 1, 2, 2, 1L)),
      "116/128 silent splits")
    assert(got(5L) == Seq((5L, 0, 0, 2, 3L)),
      "115/128 silent does not split — one maximal run")
    intercept[IllegalArgumentException] {
      Multimodal.wavUtterances(rows, "doc_id", "payload", silenceTol = 128)
    }
    intercept[IllegalArgumentException] {
      Multimodal.wavUtterances(rows, "doc_id", "payload", minSilentFrac = 0.0)
    }
  }
}
