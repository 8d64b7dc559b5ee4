package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** The REAL image decoder behind the perceptual rungs (round-12):
  * `javax.imageio` decode → BT.601 luma → 2-D 9×8 dHash grid. All
  * fixtures are deterministically GENERATED PNGs/JPEGs (BufferedImage
  * pixel math — no external files), so every assertion is exact and
  * replayable; the rungs themselves are honestly NOT DuckDB-oracle-able
  * (the oracle cannot decode JPEG), the streaming/sketch honesty class.
  * Reference behavior: carrot-transform has no media surface; the dHash
  * contract is the public image-dedup standard. */
class ImageDecodeSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  /** Deterministic grayscale image: pixel (x, y) has luma f(x, y). */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    encode("png", w, h)(f)

  private def encode(fmt: String, w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  // block pattern: each 9×8-grid cell is near-constant with luma
  // (c·37 + r·71) % 200 — adjacent-cell margins ≥ 29, far above JPEG
  // noise, so every horizontal comparison is decided with headroom
  private def cellPattern(w: Int, h: Int)(x: Int, y: Int): Int =
    (((x * 9) / w) * 37 + ((y * 8) / h) * 71) % 200

  test("decodeImage: exact BT.601 luma, dimensions, channels; garbage is None") {
    val bytes = png(3, 1) { (x, _) => x * 100 } // lumas 0, 100, 200
    val d = Multimodal.decodeImage(bytes).get
    assert(d.width == 3 && d.height == 1 && d.channels == 3)
    assert(d.luma.toSeq == Seq(0.toByte, 100.toByte, 200.toByte))
    // a pure-red pixel: (299*255 + 0 + 0) / 1000 = 76 integer math
    val img = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff0000)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    assert(Multimodal.decodeImage(out.toByteArray).get.luma.head == 76.toByte)
    assert(Multimodal.decodeImage("not an image at all".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
    assert(Multimodal.decodeImage(null).isEmpty)
  }

  test("dHashImage: identity, sub-cell edit near, cell blackout 1-2 bits, re-encode stable, inverse far") {
    val w = 63; val h = 48 // 7x6-pixel grid cells
    val base = png(w, h)(cellPattern(w, h))
    val h0 = Multimodal.dHashImage(base).get
    // identity: the same pixels encoded independently hash identically
    assert(Multimodal.dHashImage(png(w, h)(cellPattern(w, h))).get == h0)
    // a single-pixel edit moves one 42-px cell mean by ~6 lumas — far
    // under the 29+ margins, so the hash is unchanged or 1 bit off
    val onePx = png(w, h) { (x, y) =>
      if (x == 30 && y == 20) 255 else cellPattern(w, h)(x, y) }
    assert(java.lang.Long.bitCount(Multimodal.dHashImage(onePx).get ^ h0) <= 1)
    // blacking out one whole interior cell flips exactly the (left,
    // right) comparisons that straddle it: 1-2 bits, never 0, never many
    val blackout = png(w, h) { (x, y) =>
      if ((x * 9) / w == 4 && (y * 8) / h == 3) 0
      else cellPattern(w, h)(x, y) }
    val dBlack = java.lang.Long.bitCount(Multimodal.dHashImage(blackout).get ^ h0)
    assert(dBlack >= 1 && dBlack <= 2, s"cell blackout moved $dBlack bits")
    // JPEG re-encode: lossy artifacts stay far inside the cell margins
    val jpegBytes = encode("jpg", w, h)(cellPattern(w, h))
    val dJpeg = java.lang.Long.bitCount(Multimodal.dHashImage(jpegBytes).get ^ h0)
    assert(dJpeg <= 2, s"jpeg re-encode moved $dJpeg bits")
    // luma inversion flips (almost) every decided comparison
    val inverse = png(w, h) { (x, y) => 200 - cellPattern(w, h)(x, y) }
    assert(java.lang.Long.bitCount(Multimodal.dHashImage(inverse).get ^ h0) > 16)
    // degenerate dimensions: empty grid columns mean 0.0 (the stub's
    // absent-cell convention) — hashes, never throws
    assert(Multimodal.dHashImage(png(4, 2)((x, y) => x * 50 + y)).isDefined)
  }

  test("perceptualDupPairsDecoded: re-encoded twins pair, different images don't, garbage drops") {
    val w = 63; val h = 48
    val rows = Seq(
      (0L, png(w, h)(cellPattern(w, h))),
      (1L, encode("jpg", w, h)(cellPattern(w, h))),          // re-encode of 0
      (2L, png(w, h) { (x, y) => 200 - cellPattern(w, h)(x, y) }), // inverse
      (3L, "corrupted garbage bytes".getBytes)                // undecodable
    ).toDF("doc_id", "payload")
    val pairs = Multimodal.perceptualDupPairsDecoded(rows, "doc_id", "payload",
        maxDist = 6, nBands = 4)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs.keySet == Set(0L -> 1L), s"got $pairs")
    assert(pairs(0L -> 1L) <= 2)
    // the stub rung on the same bytes finds nothing: PNG vs JPEG bytes
    // differ wildly — exactly the gap the real decoder closes
    assert(Multimodal.perceptualDupPairs(rows, "doc_id", "payload",
      maxDist = 6, nBands = 4).count() == 0)
  }

  test("frameDupPairsDecoded: aligned keyframes pair, trimmed clip needs the shifted rung") {
    val w = 63; val h = 48
    def frame(s: Int) = png(w, h) { (x, y) =>
      (cellPattern(w, h)(x, y) + s * 53) % 200 }
    val f = (1 to 5).map(frame)
    val rows = Seq(
      (0L, Multimodal.packImageFrames(f)),                    // F1..F5
      (1L, Multimodal.packImageFrames(f.take(4) :+ frame(9))),// 4 aligned
      (2L, Multimodal.packImageFrames(f.drop(1))),            // trimmed +1
      (3L, Multimodal.packImageFrames(Seq(frame(7), frame(8))))
    ).toDF("doc_id", "payload")
    val aligned = Multimodal.frameDupPairsDecoded(rows, "doc_id", "payload",
        maxFrames = 8, maxDist = 2, minMatchedFrames = 3)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(aligned.keySet == Set(0L -> 1L), s"got $aligned")
    assert(aligned(0L -> 1L)._1 == 4L)
    val shifted = Multimodal.frameDupPairsShiftedDecoded(rows, "doc_id",
        "payload", maxFrames = 8, maxDist = 2, minMatchedFrames = 4)
      .as[(Long, Long, Int, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // the trimmed clip assembles at offset +1 with 4 votes
    assert(shifted(0L -> 2L) == ((1, 4L)))
    assert(!shifted.contains(0L -> 3L) && !shifted.contains(1L -> 3L))
    // a truncated container (half a length prefix) keeps parsed frames
    val whole = Multimodal.packImageFrames(f.take(2))
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 2)
    val kept = Multimodal.splitImageFrames(cut, 8)
    assert(kept.map(_._1) == Seq(0) &&
      Multimodal.splitImageFrames(whole, 8).map(_._1) == Seq(0, 1))
    // a corrupt length prefix near 2^31 must STOP parsing, not overflow
    // the bounds check into a copyOfRange crash (round-12 advice: the
    // naive `off + 4 + len > length` guard wraps negative at 0x7FFFFFF0)
    val hostile = Multimodal.packImageFrames(f.take(1)) ++
      Array[Byte](0x7f, 0xff.toByte, 0xff.toByte, 0xf0.toByte) ++
      Array.fill[Byte](16)(1)
    assert(Multimodal.splitImageFrames(hostile, 8).map(_._1) == Seq(0))
  }

  test("extractImageFeatures: true dimensions and brightness, undecodables audited not dropped") {
    val rows = Seq(
      (0L, png(16, 9)((_, _) => 51)),            // uniform luma 51
      (1L, "garbage".getBytes)
    ).toDF("doc_id", "t")
    val packed = rows.select(col("doc_id"), col("t").as("payload"))
    val got = Multimodal.extractImageFeatures(packed)
      .as[(Long, Boolean, Int, Int, Int, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L) == ((0L, true, 16, 9, 3, 51.0 / 255.0)))
    assert(got(1L) == ((1L, false, 0, 0, 0, -1.0)))
  }

  test("sceneSegments in the imageio space: decoded keyframes segment; storyboard survives padding") {
    val w = 63; val h = 48
    def frame(s: Int) = png(w, h) { (x, y) =>
      (cellPattern(w, h)(x, y) + s * 53) % 200 }
    // identical frames sit at distance 0; DIFFERENT pattern frames sit
    // beyond Hamming 2 (the frameDupPairsDecoded contract), so
    // cutThreshold 2 separates within-scene stability from content cuts
    val clipA = Multimodal.packImageFrames(
      Seq(frame(1), frame(1), frame(2), frame(2), frame(5)))
    val rows = Seq((0L, clipA)).toDF("doc_id", "payload")
    val got = Multimodal.sceneSegments(rows, "doc_id", "payload",
        maxFrames = 8, cutThreshold = 2,
        decoder = Multimodal.ImageioDecoder)
      .as[(Long, Int, Int, Int, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5), r._6)).toMap
    assert(got.keySet == Set(0, 1, 2))
    assert(got(0)._1 == ((0, 1, 2L)) && got(1)._1 == ((2, 3, 2L))
      && got(2)._1 == ((4, 4, 1L)))
    // keyframes are the REAL decoder's signatures, not the byte stub
    assert(got(0)._2 == Multimodal.dHashImage(frame(1)).get)
    assert(got(1)._2 == Multimodal.dHashImage(frame(2)).get)
    // storyboard identity: within-scene duplicate frames are invisible
    val clipB = Multimodal.packImageFrames(
      Seq(frame(1), frame(2), frame(2), frame(2), frame(5)))
    val clipC = Multimodal.packImageFrames(Seq(frame(9), frame(2)))
    val fp = Multimodal.storyboardFingerprints(
        Seq((0L, clipA), (1L, clipB), (2L, clipC)).toDF("doc_id", "payload"),
        "doc_id", "payload", maxFrames = 8, cutThreshold = 2,
        decoder = Multimodal.ImageioDecoder)
      .as[(Long, String)].collect().toMap
    assert(fp(0L) == fp(1L), "same keyframe sequence through the real decoder")
    assert(fp(0L) != fp(2L))
  }

  test("resizeImages: aspect-preserving bound, verbatim pass-through, lossless content, audit rows") {
    val rows = Seq(
      (0L, png(64, 48)((_, _) => 100)),  // over both bounds -> 32x24
      (1L, png(16, 9)((_, _) => 51)),    // already fits -> verbatim
      (2L, "garbage".getBytes),          // undecodable -> audited
      (3L, png(100, 10)((_, _) => 7))    // wide: width binds -> 32x3
    ).toDF("doc_id", "payload")
    val got = Multimodal.resizeImages(rows, "doc_id", maxW = 32, maxH = 32)
      .as[(Long, Boolean, Boolean, Int, Int, Array[Byte])].collect()
      .map(r => r._1 -> r).toMap
    assert(got(0L)._2 && got(0L)._3 && (got(0L)._4, got(0L)._5) == ((32, 24)))
    // bilinear on a constant plane is the constant: decode the thumb
    // and check every BT.601 luma is exactly 100 (gray v -> luma v)
    val thumb = Multimodal.decodeImage(got(0L)._6).get
    assert(thumb.width == 32 && thumb.height == 24)
    assert(thumb.luma.forall(b => (b & 0xff) == 100),
      "lossless re-encode of a constant plane keeps every pixel")
    // within-bounds payloads pass through VERBATIM, not re-encoded
    assert(!got(1L)._3 && got(1L)._6.sameElements(png(16, 9)((_, _) => 51)))
    assert(!got(2L)._2 && got(2L)._6 == null, "undecodable audits with NULL payload")
    assert((got(3L)._4, got(3L)._5) == ((32, 3)),
      "the binding dimension scales, the other floors (never 0)")
    // idempotence: resizing the resized output is a verbatim pass-through
    val again = Multimodal.resizeImages(
        Seq((0L, got(0L)._6)).toDF("doc_id", "payload"), "doc_id",
        maxW = 32, maxH = 32)
      .as[(Long, Boolean, Boolean, Int, Int, Array[Byte])].collect().head
    assert(again._2 && !again._3 && again._6.sameElements(got(0L)._6))
    // an alpha-bearing PNG keeps its transparency — RGBA rendered onto
    // an opaque canvas would turn transparent regions black (self-review)
    val argbSrc = new java.awt.image.BufferedImage(64, 64,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    for (y <- 0 until 64; x <- 0 until 64)
      argbSrc.setRGB(x, y, if (x < 32) 0x00000000 else 0xffc86432.toInt)
    val argbOut = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(argbSrc, "png", argbOut)
    val argbThumb = Multimodal.resizeImages(
        Seq((9L, argbOut.toByteArray)).toDF("doc_id", "payload"), "doc_id",
        maxW = 16, maxH = 16)
      .as[(Long, Boolean, Boolean, Int, Int, Array[Byte])].collect().head
    val decodedThumb = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(argbThumb._6))
    assert(decodedThumb.getColorModel.hasAlpha, "the thumbnail keeps alpha")
    assert(((decodedThumb.getRGB(2, 8) >>> 24) & 0xff) == 0,
      "the transparent half stays transparent, not black")
    assert(((decodedThumb.getRGB(13, 8) >>> 24) & 0xff) == 0xff,
      "the opaque half stays opaque")
    intercept[IllegalArgumentException] {
      Multimodal.resizeImages(rows, "doc_id", maxW = 0)
    }
    intercept[IllegalArgumentException] {
      Multimodal.resizeImages(rows, "doc_id", format = "jpg")
    }
    // round-14 advice fix: format="bmp" on an alpha-bearing source — the
    // JDK BMP writer refuses TYPE_INT_ARGB (ImageIO.write returns false),
    // which previously emitted valid=true with an EMPTY payload (silent
    // corruption). The refused encode must now audit as an invalid row —
    // and on any JDK that CAN encode it, the payload must be non-empty.
    // Never again valid=true beside a missing payload.
    val bmpAlpha = Multimodal.resizeImages(
        Seq((10L, argbOut.toByteArray)).toDF("doc_id", "payload"), "doc_id",
        maxW = 16, maxH = 16, format = "bmp")
      .as[(Long, Boolean, Boolean, Int, Int, Array[Byte])].collect().head
    assert(!(bmpAlpha._2 && (bmpAlpha._6 == null || bmpAlpha._6.isEmpty)),
      "a refused encode must not read valid=true with an empty payload")
    if (!bmpAlpha._2)
      assert(bmpAlpha._6 == null && !bmpAlpha._3,
        "the refused-encode audit row carries the undecodable shape")
  }
}
