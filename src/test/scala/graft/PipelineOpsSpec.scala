package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{BloomJoin, Corpus, Dedup, TextAnalysis}

/** Round-4 training-pipeline operators: benchmark decontamination,
  * repetition quality metrics, stratified hash sampling, and the
  * bloom-filter semi-join reduction. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  test("funnel: strict ordering, same-ts ties, missing first step") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(s * 1000)
    val ev = Seq(
      // u1 full funnel in order → 3
      (1L, t(10), "view"), (1L, t(20), "click"), (1L, t(30), "purchase"),
      // u2 click BEFORE view never re-fires → view only → 1
      (2L, t(10), "click"), (2L, t(20), "view"),
      // u3 click at the SAME ts as the first view: strictly-after fails,
      // the later click rescues step 2 → 2
      (3L, t(10), "view"), (3L, t(10), "click"), (3L, t(40), "click"),
      // u4 purchase before click → stuck at click → 2
      (4L, t(10), "view"), (4L, t(15), "purchase"), (4L, t(20), "click"),
      // u5 only non-first steps → 0
      (5L, t(10), "purchase"),
      // u6 only irrelevant events → no row
      (6L, t(10), "error")
    ).toDF("user_id", "ts", "event_type")
    val got = graft.ops.Sessionize.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 2, 4L -> 2, 5L -> 0))
    // conversion window: u1's click is 10 s after the view — a 5 s window
    // stops it at step 1 and no later step re-fires (no re-anchoring); an
    // exactly-10 s window includes the boundary (closed interval)
    val win = graft.ops.Sessionize.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapSeconds = Some(5L))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(win(1L) == 1)
    val win10 = graft.ops.Sessionize.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), maxGapSeconds = Some(10L))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(win10(1L) == 3)
  }

  test("retentionCohorts: first-period cohort, distinct-active counts, multi-cohort") {
    import java.sql.Timestamp
    def t(day: Long, h: Long = 0) = new Timestamp((day * 86400 + h * 3600) * 1000)
    val ev = Seq(
      // u1 first day 0, active days 0 (twice — counted once), 1, 3
      (1L, t(0)), (1L, t(0, 5)), (1L, t(1)), (1L, t(3)),
      // u2 first day 0, active day 0 only
      (2L, t(0, 23)),
      // u3 first day 2 (a LATER cohort), active days 2 and 3
      (3L, t(2)), (3L, t(3))
    ).toDF("user_id", "ts")
    val got = graft.ops.Sessionize.retentionCohorts(ev, "user_id", "ts", 86400L)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(got == Map(
      (0L, 0) -> 2L, (0L, 1) -> 1L, (0L, 3) -> 1L,
      (2L, 0) -> 1L, (2L, 1) -> 1L))
  }

  test("knownBigramRatio scores docs by corpus-frequent bigram coverage") {
    // "a b" occurs 3× corpus-wide (docs 0,1,2) → known at minCount=3;
    // every other bigram occurs once
    val docs = Seq(
      (0L, "a b c"),   // bigrams: "a b"(known), "b c" → 1/2
      (1L, "a b"),     // "a b" → 1/1
      (2L, "x a b"),   // "x a", "a b" → 1/2
      (3L, "p q r"),   // none known → 0/2
      (4L, "solo"),    // <2 tokens: no row
      (5L, "")         // empty: no row
    ).toDF("doc_id", "text")
    val got = Corpus.knownBigramRatio(docs, "doc_id", "text", minCount = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(
      0L -> ((2L, 0.5)), 1L -> ((1L, 1.0)), 2L -> ((2L, 0.5)), 3L -> ((2L, 0.0))))
  }

  test("contaminationFlags marks exactly the docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),     // contains the bench 5-gram
      (1L, "one two three four five six seven"),       // clean
      (2L, "short"),                                   // sub-shingle length: clean
      (3L, "")                                         // empty: clean
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "xx alpha beta gamma delta epsilon yy")).toDF("doc_id", "text")
    val flags = Dedup.contaminationFlags(train, bench, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(flags == Map(0L -> 1, 1L -> 0, 2L -> 0, 3L -> 0))
    // the shuffle (non-broadcast) path computes the identical flags
    val shuffled = Dedup.contaminationFlags(train, bench, "doc_id", "text",
      n = 5, broadcastBench = false)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(shuffled == flags)
  }

  test("dup fractions: exact values, null on empty/short docs, raw grams keep dups") {
    val docs = Seq(
      (0L, "a b a b"),        // 4 tokens, 2 distinct -> 0.5; 2 bigrams "a b"/"b a"...
      (1L, "x y z"),          // all distinct -> 0.0
      (2L, "")                // empty -> null
    ).toDF("doc_id", "text")
    val r = docs.select(col("doc_id"),
        TextAnalysis.dupTokenFrac(col("text")).as("dt"),
        TextAnalysis.dupNgramFrac(col("text"), 3).as("d3"))
      .collect().map(x => x.getLong(0) -> (Option(x.get(1)), Option(x.get(2)))).toMap
    assert(r(0L)._1.contains(0.5))
    assert(r(1L)._1.contains(0.0))
    // empty text splits to [""] — ONE token, so token-dup is 0.0 (matching
    // the oracle's regexp_split_to_array); the 3-gram frac is null (no grams)
    assert(r(2L) == ((Some(0.0), None)))
    // "a b a b": 3-grams are [a b a, b a b] — both distinct -> 0.0
    assert(r(0L)._2.contains(0.0))
    // positional duplicates are KEPT by rawNgrams (unlike Dedup.shingles)
    val grams = docs.filter(col("doc_id") === 0L)
      .select(TextAnalysis.rawNgrams(col("text"), 2).as("g"))
      .head.getSeq[String](0)
    assert(grams == Seq("a b", "b a", "a b"))
  }

  test("stratifiedSampleFilter: deterministic, per-stratum rates, default fraction") {
    val rows = (0L until 4000L).map(i => (i, if (i % 2 == 0) "en" else "other"))
      .toDF("k", "s")
    val keep = TextAnalysis.stratifiedSampleFilter(col("k"), col("s"),
      Map("en" -> 0.2), defaultFraction = 0.5)
    val counts = rows.filter(keep).groupBy("s").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 2000 keys per stratum; md5 uniformity puts en near 400, other near 1000
    assert(counts("en") > 300 && counts("en") < 500, counts.toString)
    assert(counts("other") > 880 && counts("other") < 1120, counts.toString)
    // membership is a pure function of (key, stratum): stable across evals
    assert(rows.filter(keep).count() == rows.filter(keep).count())
    // fraction 0 keeps nothing, 1.0 keeps everything
    val none = TextAnalysis.stratifiedSampleFilter(col("k"), col("s"),
      Map.empty, defaultFraction = 0.0)
    assert(rows.filter(none).count() == 0)
    val all = TextAnalysis.stratifiedSampleFilter(col("k"), col("s"),
      Map.empty, defaultFraction = 1.0)
    assert(rows.filter(all).count() == 4000)
  }

  test("binnedRangeJoin matches the naive BETWEEN join across bin widths") {
    val points = Seq(
      (1L, 0L), (1L, 5L), (1L, 10L), (1L, 99L), (1L, 100L),
      (2L, 5L), (3L, 5L)
    ).toDF("k", "t")
    val intervals = Seq(
      (1L, 100L, 0L, 10L),      // catches t=0,5,10
      (1L, 101L, 10L, 10L),     // single-point interval: t=10
      (1L, 102L, 50L, 99L),     // catches t=99
      (2L, 200L, 0L, 4L),       // t=5 just outside
      (3L, 300L, 6L, 4L),       // inverted: matches nothing
      (4L, 400L, 0L, 100L)      // key with no points
    ).toDF("k", "iid", "s", "e")
    val naive = points.join(intervals, Seq("k"))
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("iid", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 3L, 7L, 1000L)) {
      val binned = graft.ops.RangeJoin.binnedRangeJoin(
          points, intervals, Seq("k"), "t", "s", "e", binWidth = w)
        .select("iid", "t").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(binned == naive, s"binWidth=$w")
    }
    assert(naive == Set((100L, 0L), (100L, 5L), (100L, 10L), (101L, 10L), (102L, 99L)))
  }

  test("weightedSampleFilter: rate tracks the weight, clamps, deterministic") {
    val rows = (0L until 3000L).toDF("k")
    def kept(w: Double): Long = rows.filter(
      graft.ops.TextAnalysis.weightedSampleFilter(col("k"), lit(w))).count()
    assert(kept(0.0) == 0)
    assert(kept(-1.0) == 0)       // clamped
    assert(kept(1.0) == 3000)
    assert(kept(5.0) == 3000)     // clamped
    val half = kept(0.5)
    assert(half > 1350 && half < 1650, s"p=0.5 kept $half/3000")
    // monotone in the weight: a kept row stays kept as its weight grows
    val flips = rows.filter(
        graft.ops.TextAnalysis.weightedSampleFilter(col("k"), lit(0.3)) &&
        !graft.ops.TextAnalysis.weightedSampleFilter(col("k"), lit(0.7))).count()
    assert(flips == 0)
  }

  test("chunkTokens: full coverage, exact overlap, short docs yield one chunk") {
    val docs = Seq(
      (0L, (1 to 40).map("w" + _).mkString(" ")), // 40 tokens: chunks at 0,12,24
      (1L, "a b c"),                              // shorter than a chunk
      (2L, (1 to 16).map("w" + _).mkString(" ")), // exactly one chunk
      (3L, (1 to 17).map("w" + _).mkString(" "))  // one token spills to chunk 2
    ).toDF("doc_id", "text")
    val chunks = docs.select(col("doc_id"),
        explode(graft.ops.TextAnalysis.chunkTokens(col("text"), 16, 4)).as("c"))
      .select(col("doc_id"), col("c.idx"), col("c.chunk"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val byDoc = chunks.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(byDoc(1L) == Seq("a b c"))
    assert(byDoc(2L).size == 1)
    // 17 tokens, stride 12: chunk0 = 1..16, chunk1 = 13..17 (5 tokens)
    assert(byDoc(3L).size == 2)
    assert(byDoc(3L)(1) == (13 to 17).map("w" + _).mkString(" "))
    // 40 tokens: starts 0,12,24 -> 3 chunks; concatenating de-overlapped
    // chunks reconstructs the doc (every token covered exactly)
    assert(byDoc(0L).size == 3)
    val rebuilt = byDoc(0L).zipWithIndex.map { case (c, i) =>
      if (i == 0) c else c.split(" ").drop(4).mkString(" ")
    }.mkString(" ")
    assert(rebuilt == (1 to 40).map("w" + _).mkString(" "))
  }

  test("cleanCorpus: gate, min-id dedup, decontamination, chunking compose; scope owns caches") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val train = Seq(
      (1L, (1 to 30).map("w" + _).mkString(" ")),            // clean, 30 tokens
      (2L, (1 to 30).map("w" + _).mkString(" ")),            // exact dup of 1 -> dropped
      (3L, "too short"),                                     // gated out
      (4L, "x1 x2 x3 x4 x5 " + (1 to 20).map("b" + _).mkString(" ")) // contaminated
    ).toDF("doc_id", "text")
    val bench = Seq((100L, (1 to 10).map("b" + _).mkString(" "))).toDF("doc_id", "text")
    graft.ops.CacheScope.withScope { scope =>
      val out = graft.ops.Pipeline.cleanCorpus(train, bench, "doc_id", "text",
          minTokens = 20, ngram = 5, chunkSize = 16, overlap = 4, scope = scope)
        .collect()
      // only doc 1 survives: 30 tokens -> chunk starts 0, 12, 24
      assert(out.map(_.getLong(0)).toSet == Set(1L))
      assert(out.map(_.getInt(1)).sorted.toSeq == Seq(0, 1, 2))
    }
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      s"leaked: ${(sc.getPersistentRDDs.keySet -- before).toSeq.sorted}")
  }

  test("refineCorpus: gopher gate -> survivor-built vocab gate -> span removal, in rung order") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val docs = Seq(
      (1L, "the quick brown foxes and their sturdy friends run daily"),
      (2L, "zz xx qq ww vv"),                                          // gopher: zero stopword hits
      (3L, "the raven and kookaburra quarrel over distant warm rivers"), // vocab: 7/9 OOV vs the survivor vocab
      (4L, "the quick brown foxes and their sturdy friends rest nightly") // loses the shared span to doc 1
    ).toDF("doc_id", "text")
    graft.ops.CacheScope.withScope { scope =>
      val out = graft.ops.Pipeline.refineCorpus(docs, "doc_id", "text",
          minWords = 5, vocabTopK = 8, maxOovFrac = 0.5, spanN = 3, scope = scope)
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
      // the 8-word shared prefix is one chained dup span: doc 1 (first) keeps
      // it, doc 4 keeps only its non-shared tail; doc 3's OOV rate is judged
      // against a vocabulary doc 2's junk never voted for
      assert(out == Seq(
        (1L, 10L, 10L, "the quick brown foxes and their sturdy friends run daily"),
        (4L, 10L, 2L, "rest nightly")))
    }
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      s"leaked: ${(sc.getPersistentRDDs.keySet -- before).toSeq.sorted}")
  }

  test("sampleFrames: full frames only, cap respected, short payloads empty") {
    val rows = Seq(
      (0L, "x" * 200),  // frames at 0,64,128 -> 3 full 32-byte frames
      (1L, "y" * 500),  // available 8, capped at 5
      (2L, "z" * 31),   // shorter than one frame -> none
      (3L, "")
    ).toDF("id", "t")
    val packed = graft.ops.Multimodal.packBinary(rows, "id", "t")
    val frames = packed.select(col("id"),
        explode(graft.ops.Multimodal.sampleFrames(col("payload"), 32, 64, 5)).as("f"))
      .select(col("id"), col("f.frame_idx"), octet_length(col("f.frame")).as("len"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byId = frames.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byId == Map(0L -> Seq(0, 1, 2), 1L -> Seq(0, 1, 2, 3, 4)))
    assert(frames.forall(_._3 == 32), "every sampled frame is full-size")
  }

  test("dHash: identity is distance 0, a first-byte edit stays within 1 bit, rotation is far") {
    import graft.ops.Multimodal
    val base = "the quick brown fox jumps over the lazy dog " * 8
    val rows = Seq(
      (0L, base),                       // original
      (1L, base),                       // byte-identical twin -> dist 0
      (2L, "Z" + base.drop(1)),         // same length, first byte edited:
                                        // only cell 0's mean moves -> <= 1 bit
      (3L, base.drop(17) + base.take(17)), // rotation: every cell re-bins
      (4L, ""),                          // empty payload -> hash 0
      (5L, "ab")                         // shorter than the 72-cell grid
    ).toDF("doc_id", "t")
    val packed = Multimodal.packBinary(rows, "doc_id", "t")
    val sigs = packed.select(col("doc_id"), Multimodal.dHash(col("payload")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(sigs(0L) == sigs(1L), "identical payloads hash identically")
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(2L)) <= 1,
      "a same-length first-byte edit moves only the cell-0 comparison")
    assert(java.lang.Long.bitCount(sigs(0L) ^ sigs(3L)) > 6,
      "a rotation re-bins every cell - perceptually far")
    assert(sigs(4L) == 0L, "empty payload hashes to 0")
    // the expression and its driver-side reference arithmetic agree
    // (eval path, codegen path and the oracle share DHash64.hash)
    for ((id, t) <- Seq((0L, base), (5L, "ab")))
      assert(sigs(id) == graft.functions.DHash64.hash(t.getBytes("UTF-8")))

    val pairs = Multimodal.perceptualDupPairs(packed, "doc_id", "payload",
        maxDist = 6, nBands = 4)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((0L, 1L)) == 0)
    assert(pairs((0L, 2L)) <= 1 && pairs((1L, 2L)) <= 1)
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((1L, 3L)),
      "the rotation must not enter the Hamming-6 ball")
    // each pair exactly once despite colliding in several bands
    assert(pairs.keys.toSeq.distinct.size == pairs.size)

    // maxPerBucket keeps the LOWEST ids deterministically: with three
    // identical payloads and cap 2, id 2's bands are dropped everywhere,
    // so only (0,1) survives
    val trip = Multimodal.packBinary(
      Seq((0L, base), (1L, base), (2L, base)).toDF("doc_id", "t"), "doc_id", "t")
    val capped = Multimodal.perceptualDupPairs(trip, "doc_id", "payload",
        maxDist = 0, nBands = 4, maxPerBucket = 2)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped == Set((0L, 1L)))

    intercept[IllegalArgumentException] {
      Multimodal.perceptualDupPairs(packed, "doc_id", "payload", nBands = 3)
    }
    intercept[IllegalArgumentException] {
      Multimodal.perceptualDupPairs(packed, "doc_id", "payload", maxDist = 65)
    }
  }

  test("frameDupPairs: aligned frames count, one edit tolerated, below-threshold excluded") {
    import graft.ops.Multimodal
    // deterministic 128-byte blocks, pairwise dHash distance >= 7
    // (verified), so only ALIGNED EQUAL frames match at maxDist 2
    def block(s: Int): String =
      (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
    val rows = Seq(
      (0L, block(1) + block(2) + block(3) + block(4)),  // F1 F2 F3 F4
      (1L, block(1) + block(2) + block(3) + block(9)),  // 3 aligned matches
      (2L, block(1) + block(6) + block(7) + block(8)),  // only 1 -> excluded
      (3L, block(1) + block(2) + block(3) + block(4)),  // identical to 0
      (4L, block(5))                                     // 1 frame only
    ).toDF("doc_id", "t")
    val packed = Multimodal.packBinary(rows, "doc_id", "t")
    val got = Multimodal.frameDupPairs(packed, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8,
        maxDist = 2, minMatchedFrames = 3)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.keySet == Set((0L, 1L), (0L, 3L), (1L, 3L)))
    assert(got((0L, 3L)) == (4L, 0))
    assert(got((0L, 1L)) == (3L, 0) && got((1L, 3L)) == (3L, 0))
  }

  test("frameDupPairsShifted: offset votes assemble trimmed copies, scatter stays out") {
    import graft.ops.Multimodal
    def block(s: Int): String =
      (0 until 64).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
    val full = (1 to 5).map(block).mkString            // F1 F2 F3 F4 F5
    val rows = Seq(
      (0L, full),                                      // the original clip
      (1L, full.drop(64)),                             // trimmed: frames shift by +1
      (2L, block(1) + block(9) + block(3) + block(8)), // 2 matches at DIFFERENT
                                                       // offsets (0 and -? ) -> no
                                                       // single offset reaches 3
      (3L, full)                                       // identical -> offset 0, 5 votes
    ).toDF("doc_id", "t")
    val got = Multimodal.frameDupPairsShifted(
        Multimodal.packBinary(rows, "doc_id", "t"), "doc_id", "payload",
        frameBytes = 64, stride = 64, maxFrames = 8,
        maxDist = 2, minMatchedFrames = 3)
      .as[(Long, Long, Int, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // the trimmed copy assembles at offset +1 (orig frame k+1 = trimmed frame k)
    assert(got((0L, 1L)) == (1, 4L, 0))
    assert(got((0L, 3L)) == (0, 5L, 0))
    assert(got((1L, 3L)) == (-1, 4L, 0))
    assert(!got.keySet.exists(p => p._1 == 2L || p._2 == 2L),
      "matches scattered across offsets must not assemble a pair")
  }

  test("perceptualDupRateCurve / perceptualBandingEval: driver-replayed counts, empty cutoffs kept") {
    import graft.ops.Multimodal
    // per-doc arithmetic word sequences (the StandingIndexSpec recipe)
    // so the four payloads are perceptually distinct except the planted
    // dup (dist 0) and first-byte mutant (dist <= 1)
    val words = Seq("alpha", "Bravo", "chi", "DELTA", "echo2",
      "foxtrot", "Golf77", "hotel", "IndiaInk", "julietX")
    def mk(i: Int): String = (0 until 60).map { k =>
      words((((i + 1) * 2654435761L + k * 40503L + i.toLong * k * 97L) % 10).toInt)
    }.mkString(" ")
    val texts = Map(0L -> mk(0), 1L -> mk(0), 2L -> ("Z" + mk(0).drop(1)), 3L -> mk(3))
    val sigs = texts.view.mapValues(t =>
      graft.functions.DHash64.hash(t.getBytes("UTF-8"))).toMap
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    val ds = Seq(0, 1, 6)
    // every planted pair is within Hamming 1 (< nBands), so banded ==
    // exact and the driver replay below is the full truth
    assert(dist(0L, 1L) == 0 && dist(0L, 2L) <= 1 && dist(0L, 3L) > 6)
    val packed = Multimodal.packBinary(
      texts.toSeq.toDF("doc_id", "t"), "doc_id", "t")
    def expVictims(c: Int) = texts.keys.count(b =>
      texts.keys.exists(a => a < b && dist(a, b) <= c))
    val got = Multimodal.perceptualDupRateCurve(packed, "doc_id", "payload",
        maxDists = ds)
      .as[(Int, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    for (c <- ds) {
      val v = expVictims(c)
      assert(got(c) == ((c, v.toLong, 4L, v.toDouble / 4)), s"cutoff $c: ${got(c)}")
    }
    val eval = Multimodal.perceptualBandingEval(packed, "doc_id", "payload",
        maxDists = ds)
      .as[(Int, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def expPairs(c: Int) = texts.keys.toSeq.combinations(2)
      .count { case Seq(a, b) => dist(math.min(a, b), math.max(a, b)) <= c }
    for (c <- ds)
      assert(eval(c) == ((c, expPairs(c).toLong, expPairs(c).toLong, 1.0)))
    // n_true = 0 reads recall 1.0 (nothing to find), the row is kept
    val far = Multimodal.packBinary(
      Seq((0L, mk(0)), (3L, mk(3))).toDF("doc_id", "t"), "doc_id", "t")
    val empty = Multimodal.perceptualBandingEval(far, "doc_id", "payload",
        maxDists = Seq(0)).as[(Int, Long, Long, Double)].collect()
    assert(empty.toSeq == Seq((0, 0L, 0L, 1.0)))
    // the eval-scale bound is ENFORCED (round-12 verdict #3): the
    // all-pairs ground truth over more rows than maxEvalRows fails
    // loudly instead of quietly going quadratic; the knob raises it
    val eGuard = intercept[IllegalArgumentException] {
      Multimodal.perceptualBandingEval(packed, "doc_id", "payload",
        maxDists = ds, maxEvalRows = 3)
    }
    assert(eGuard.getMessage.contains("ALL-PAIRS") &&
      eGuard.getMessage.contains("maxEvalRows"))
    assert(Multimodal.perceptualBandingEval(packed, "doc_id", "payload",
      maxDists = ds, maxEvalRows = 4).count() == ds.size)
  }

  test("frame rungs: constant-frame flood collapses under the cap; survivors untouched") {
    import graft.ops.Multimodal
    def block(s: Int): String =
      (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
    // the adversarial shape the cap exists for: ten identical clips of
    // one repeated "black frame" — every (frame_idx, band, value)
    // bucket holds all ten ids — plus one genuine high-id dup pair
    // whose buckets stay tiny
    val flood = (0L until 10L).map(i => (i, block(1) * 4))
    val clean = Seq((20L, block(2) + block(3) + block(4) + block(5)),
                    (21L, block(2) + block(3) + block(4) + block(5)))
    val packed = Multimodal.packBinary(
      (flood ++ clean).toDF("doc_id", "t"), "doc_id", "t")
    def aligned(cap: Int) = Multimodal.frameDupPairs(packed, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8,
        maxDist = 2, minMatchedFrames = 3, maxPerBucket = cap)
      .as[(Long, Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // uncapped: exactly C(10,2) = 45 flood pairs + the clean pair
    val un = aligned(0)
    assert(un.size == 46 && un((20L, 21L)) == (4L, 0))
    assert((0L until 10L).flatMap(a => (a + 1 until 10L).map(a -> _))
      .forall(p => un(p) == (4L, 0)))
    // capped at 4: the flood collapses to C(4,2) = 6 pairs among its
    // LOWEST ids (deterministic), the clean pair is untouched
    val capped = aligned(4)
    assert(capped.keySet ==
      ((0L until 4L).flatMap(a => (a + 1 until 4L).map(a -> _)).toSet + (20L -> 21L)))
    assert(capped.values.forall(_ == (4L, 0)))

    // the shifted rung's (band, value) buckets hold ALL flood frames
    // (10 ids x 4 frames); cap 8 keeps the two lowest ids' frames
    def shifted(cap: Int) = Multimodal.frameDupPairsShifted(packed,
        "doc_id", "payload", frameBytes = 128, stride = 128, maxFrames = 8,
        maxDist = 2, minMatchedFrames = 4, maxPerBucket = cap)
      .as[(Long, Long, Int, Long, Int)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    val sUn = shifted(0)
    assert(sUn.size == 46, "uncapped shifted: C(10,2) flood pairs + clean")
    val sCap = shifted(8)
    assert(sCap.keySet == Set(0L -> 1L, 20L -> 21L),
      "cap 8 keeps ids 0,1's frames per flood bucket - one flood pair")
    assert(sCap(0L -> 1L) == (0, 4L, 0) && sCap(20L -> 21L) == (0, 4L, 0))
  }

  test("payloadIntegrity: truncation, equal-length corruption, missing blob and clean payloads verdict correctly") {
    import graft.ops.Multimodal
    val packed = Multimodal.packBinary(Seq(
      (0L, "a perfectly healthy payload body"),
      (1L, "this one will lose its tail bytes"),
      (2L, "this one gets flipped in place!!"),
      (3L, ""),
      (4L, "this blob never arrived at all")).toDF("doc_id", "t"), "doc_id", "t")
    val tampered = packed.withColumn("payload",
      when(col("doc_id") === 1L, expr("substring(payload, 1, 10)"))
        .when(col("doc_id") === 2L,
          concat(encode(lit("T"), "utf-8"), expr("substring(payload, 2)")))
        .when(col("doc_id") === 4L, lit(null).cast("binary"))
        .otherwise(col("payload")))
    val got = Multimodal.payloadIntegrity(tampered, "doc_id")
      .collect().map(r => r.getLong(0) ->
        (r.getAs[java.lang.Long]("expected_len"),
          r.getAs[java.lang.Long]("actual_len"),
          r.getAs[String]("verdict"))).toMap
    assert(got(0L)._3 == "ok" && got(3L) == (0L, 0L, "ok"))
    assert(got(1L) == (33L, 10L, "truncated"))
    assert(got(2L)._1 == got(2L)._2 && got(2L)._3 == "corrupted")
    // the NULL payload must surface as 'missing', never fall through
    // to 'ok' via null-propagating comparisons (round-11 advice)
    assert(got(4L)._1 == 30L && got(4L)._2 == null && got(4L)._3 == "missing")

    // the media card is the SAME ladder rolled up per format: verdict
    // counts agree with the per-row audit exactly, bytes sum the
    // surviving payloads, and the missing row costs 0 bytes
    val byFmt = tampered.withColumn("meta", struct(
      when(col("doc_id") < 2L, lit("png")).otherwise(lit("wav")).as("format"),
      col("meta.byte_len").as("byte_len"),
      col("meta.content_hash").as("content_hash")))
    val card = Multimodal.mediaDatasetCard(byFmt)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long, Double)]
      .collect().map(r => r._1 -> r).toMap
    // png = docs 0 (ok, 32 bytes) + 1 (truncated to 10)
    assert(card("png") == (("png", 2L, 42L, 10L, 32L, 0L, 1L, 0L, 1L, 0.5)))
    // wav = docs 2 (corrupted, 32) + 3 (ok, 0) + 4 (missing, null->0)
    assert(card("wav") == (("wav", 3L, 32L, 0L, 32L, 1L, 0L, 1L, 1L, 1.0 / 3)))
  }

  test("quantizeMaxAbs: dequantized error bounded by 0.5/scale, zero vector null") {
    val vecs = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 17 + j) * (1 + i)))).toDF("id", "v")
    val bad = vecs.select(col("id"), col("v"),
        graft.ops.Similarity.quantScale(col("v")).as("s"),
        graft.ops.Similarity.quantizeMaxAbs(col("v")).as("q"))
      .withColumn("err", expr("aggregate(zip_with(v, q, (x, qi) -> abs(x - qi / s)), 0D, (a, e) -> greatest(a, e))"))
      .filter(col("err") > lit(0.5) / col("s") + lit(1e-12)).count()
    assert(bad == 0)
    val z = Seq((0L, Array(0.0, 0.0))).toDF("id", "v")
      .select(graft.ops.Similarity.quantScale(col("v")).as("s"))
      .filter(col("s").isNull).count()
    assert(z == 1)
  }

  test("pqEncode: a vector sitting on sub-codebook centroids encodes to exactly them") {
    import graft.ops.Similarity
    val (m, k, sd) = (4, 8, 16)
    val wantCodes = (0 until m).map(s => (s * 2 + 1) % k)
    val v = (0 until m).flatMap(s =>
      (0 until sd).map(j => Similarity.pqCentroid(s, wantCodes(s), j, "graft-pq")))
    val noisy = v.zipWithIndex.map { case (x, i) => x + (if (i % 2 == 0) 1e-4 else -1e-4) }
    val df = Seq((0L, v.toArray), (1L, noisy.toArray)).toDF("id", "v")
    val got = df.select(col("id"),
        Similarity.pqEncode(col("v"), dim = 64, m = m, k = k).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(got(0L) == wantCodes, "exact centroid vector")
    assert(got(1L) == wantCodes, "small perturbation keeps the nearest centroid")
  }

  test("pqTopK ADC distances equal the recomputed code-table lookups") {
    import graft.ops.Similarity
    val (dim, m, k, sd) = (64, 4, 8, 16)
    val rng = new scala.util.Random(7)
    val vecs = (0L until 12L).map(i => (i, Array.fill(dim)(rng.nextDouble() - 0.5)))
    val df = vecs.toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(df, "vec_id", "embedding",
        df.filter(col("vec_id") < 2), "vec_id", "embedding",
        dim, m, k, topK = 11) // >= all candidates: every (q, x) pair present
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // scala-side reference: encode each vector, then ADC = sum over subs of
    // ||q_sub - centroid(code)||^2, same association order
    def cent(s: Int, c: Int) = (0 until sd).map(j => Similarity.pqCentroid(s, c, j, "graft-pq"))
    def sub(v: Array[Double], s: Int) = v.slice(s * sd, (s + 1) * sd)
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.reduce(_ + _)
    def code(v: Array[Double], s: Int) =
      (0 until k).map(c => d2(sub(v, s), cent(s, c))).zipWithIndex.minBy(_._1)._2
    for (q <- vecs.take(2); x <- vecs if x._1 != q._1) {
      val want = (0 until m).map(s => d2(sub(q._2, s), cent(s, code(x._2, s)))).reduce(_ + _)
      assert(math.abs(got((q._1, x._1)) - want) < 1e-9, s"q=${q._1} x=${x._1}")
    }
  }

  test("PqEncode native expression: interpreted eval == codegen'd plan; null/short contracts") {
    import graft.ops.Similarity
    import org.apache.spark.sql.catalyst.util.ArrayData
    val (dim, m, k) = (64, 4, 8)
    val book = Similarity.pqBookConst(dim, m, k)
    val rng = new scala.util.Random(99)
    val vecs = (0L until 40L).map(i => (i, Array.fill(dim)(rng.nextGaussian()))).toArray
    // codegen path: through a DataFrame plan (whole-stage codegen compiles
    // the doGenCode loop)
    val viaPlan = vecs.toSeq.toDF("id", "v")
      .select(col("id"), Similarity.pqEncode(col("v"), dim, m, k).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    // interpreted path: Expression.eval over a literal child (no codegen)
    val flatBook = book.map(_.map(_.toArray).toArray).toArray
    for ((id, v) <- vecs) {
      val expr = graft.functions.PqEncode(
        org.apache.spark.sql.catalyst.expressions.Literal.create(v,
          org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
        flatBook)
      val got = expr.eval(null).asInstanceOf[ArrayData].toIntArray().toSeq
      assert(got == viaPlan(id), s"interpreted != codegen for vec $id")
    }
    // null vector → null row value; short vector → error naming the need
    val nulled = Seq((0L, null: Array[Double])).toDF("id", "v")
      .select(Similarity.pqEncode(col("v"), dim, m, k).as("c"))
      .collect()(0)
    assert(nulled.isNullAt(0))
    val err = intercept[Exception] {
      Seq((0L, Array(1.0, 2.0))).toDF("id", "v")
        .select(Similarity.pqEncode(col("v"), dim, m, k).as("c")).collect()
    }
    assert(err.getMessage != null)
  }

  test("bloomFilteredJoin equals the plain join and the probe passes every dim key") {
    val fact = (0L until 5000L).map(i => (i, i % 100)).toDF("fid", "fk")
    val dim = Seq(3L, 7L, 42L).toDF("dk")
    val got = BloomJoin.bloomFilteredJoin(fact, dim, "fk", "dk", expectedDimRows = 10L)
      .select("fid", "fk").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fid", "fk").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(want.size == 150) // 50 fact rows per matching key
  }

  test("refineCorpus withRepetition drops repetition-spam that the Gopher gate alone admits") {
    import spark.implicits._
    import graft.ops.Pipeline
    // both docs pass every Gopher rule (>= 50 words, mean len 3, alpha 1,
    // 2+ stopword hits, no symbols); the spam doc is one 2-gram repeated
    val spam = "the and" + " abc def" * 30
    val clean = "the and of to that have with be " +
      (0 until 48).map(i => f"w$i%02d").mkString(" ")
    val docs = Seq((1L, clean), (2L, spam)).toDF("doc_id", "text")
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    // without the rung both survive to the span-removal output
    assert(ids(Pipeline.refineCorpus(docs, "doc_id", "text",
      vocabTopK = 100, maxOovFrac = 1.0, spanN = 3)) == Set(1L, 2L))
    // with it, the repetition verdict (paper defaults: spam's top-2-gram
    // char share ~0.97) is intersected before the vocab vote
    assert(ids(Pipeline.refineCorpus(docs, "doc_id", "text",
      vocabTopK = 100, maxOovFrac = 1.0, spanN = 3,
      withRepetition = true)) == Set(1L))
  }

  test("sceneSegments: repeated frames hold a scene, content change cuts, keyframe = first frame") {
    import graft.ops.Multimodal
    // deterministic 128-byte blocks, pairwise dHash distance >= 7
    // (the frameDupPairs fixture), so cutThreshold 10 separates
    // identical frames (dist 0, same scene) from content changes
    def block(s: Int): String =
      (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
    val rows = Seq(
      (0L, block(1) * 3 + block(2) * 2 + block(3)), // scenes 0-2 | 3-4 | 5
      (1L, block(4)),                               // one frame, one scene
      (2L, "short")                                 // < 1 frame: no rows
    ).toDF("doc_id", "t")
    val packed = Multimodal.packBinary(rows, "doc_id", "t")
    val got = Multimodal.sceneSegments(packed, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8, cutThreshold = 10)
      .as[(Long, Int, Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5), r._6)).toMap
    assert(got.keySet == Set((0L, 0), (0L, 1), (0L, 2), (1L, 0)))
    assert(got((0L, 0))._1 == ((0, 2, 3L)))
    assert(got((0L, 1))._1 == ((3, 4, 2L)))
    assert(got((0L, 2))._1 == ((5, 5, 1L)))
    assert(got((1L, 0))._1 == ((0, 0, 1L)))
    // the keyframe is the scene's FIRST frame signature, the exact
    // DHash64 arithmetic the oracle replays
    assert(got((0L, 0))._2 == graft.functions.DHash64.hash(block(1).getBytes("UTF-8")))
    assert(got((0L, 1))._2 == graft.functions.DHash64.hash(block(2).getBytes("UTF-8")))
    assert(got((0L, 2))._2 == graft.functions.DHash64.hash(block(3).getBytes("UTF-8")))
    intercept[IllegalArgumentException] {
      Multimodal.sceneSegments(packed, "doc_id", "payload", cutThreshold = 65)
    }
    // the census is the same spans rolled up: doc 0 has 3 scenes over 6
    // frames, doc 1 has 1 scene over 1 frame, doc 2 contributes nothing
    val census = Multimodal.sceneCensus(packed, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8, cutThreshold = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(census == Set((3L, 1L, 6L), (1L, 1L, 1L)))
  }

  test("storyboard: identity robust to tail-append and within-scene padding; census finds the group") {
    import graft.ops.Multimodal
    def block(s: Int): String =
      (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
    val base = block(1) * 2 + block(2) + block(3) // keyframes [b1, b2, b3]
    val rows = Seq(
      (0L, base),
      (1L, base + "JUNK"),                             // change OUTSIDE full frames
      (2L, block(1) * 3 + block(2) + block(3)),        // extra within-scene frame,
                                                       // same keyframe sequence
      (3L, block(9) + block(2) + block(3))             // different opening scene
    ).toDF("doc_id", "t")
    val packed = Multimodal.packBinary(rows, "doc_id", "t")
    val fp = Multimodal.storyboardFingerprints(packed, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8, cutThreshold = 10)
      .as[(Long, String)].collect().toMap
    assert(fp(0L) == fp(1L), "tail-append outside the framed window is invisible")
    assert(fp(0L) == fp(2L), "within-scene duplicate frames keep the keyframe sequence")
    assert(fp(0L) != fp(3L), "a different opening scene changes the identity")
    val groups = Multimodal.storyboardDupGroups(packed, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8, cutThreshold = 10)
      .as[(String, Long, Long)].collect()
    assert(groups.toSeq == Seq((fp(0L), 3L, 0L)),
      "one dup group of three clips, canonical = lowest id")
  }

  test("sceneOverlapPairs: shared scene sets pair re-cuts; set semantics; the cap prices floods") {
    import graft.ops.Multimodal
    def block(s: Int): String =
      (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
    val rows = Seq(
      (0L, block(1) + block(2) + block(3) + block(4)), // scenes {b1,b2,b3,b4}
      (1L, block(2) + block(3) + block(4) + block(1)), // rotation: same SET
      (2L, block(2) + block(3)),                       // excerpt: contained
      (3L, block(1) + block(9)),                       // 1 shared -> excluded
      (4L, block(1) * 2 + block(5))                    // dup scene counts ONCE
    ).toDF("doc_id", "t")
    val packed = Multimodal.packBinary(rows, "doc_id", "t")
    val got = Multimodal.sceneOverlapPairs(packed, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8, cutThreshold = 10,
        minShared = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.keySet == Set((0L, 1L), (0L, 2L), (1L, 2L)))
    assert(got((0L, 1L)) == ((4L, 1.0)), "a full rotation shares the whole set")
    assert(got((0L, 2L)) == ((2L, 1.0)), "the excerpt is fully contained")
    assert(got((1L, 2L)) == ((2L, 1.0)))
    // the cap keeps the LOWEST clip ids per keyframe bucket: at 2, clip
    // 2's rows lose every bucket to clips 0 and 1, so only (0,1) pairs
    val capped = Multimodal.sceneOverlapPairs(packed, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8, cutThreshold = 10,
        minShared = 2, maxPerBucket = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(capped == Map((0L, 1L) -> ((4L, 1.0))))
    intercept[IllegalArgumentException] {
      Multimodal.sceneOverlapPairs(packed, "doc_id", "payload", minShared = 0)
    }
  }

  test("pairConsensus: corroborated pairs confirm, single-rung pairs carry their rung's name") {
    import graft.ops.Dedup
    val a = Seq((1L, 2L, 0), (1L, 3L, 2)).toDF("id_a", "id_b", "dist")
    val b = Seq((1L, 2L, 0.99), (2L, 3L, 0.5)).toDF("id_a", "id_b", "sim")
    val got = Dedup.pairConsensus(a, b, "perceptual", "embedding")
      .select(col("id_a"), col("id_b"), col("dist"), col("sim"), col("verdict"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.get(2)), Option(r.get(3)), r.getString(4)))).toMap
    assert(got((1L, 2L)) == ((Some(0), Some(0.99), "confirmed")))
    assert(got((1L, 3L)) == ((Some(2), None, "perceptual_only")))
    assert(got((2L, 3L)) == ((None, Some(0.5), "embedding_only")))
    intercept[IllegalArgumentException] {
      Dedup.pairConsensus(a.withColumnRenamed("id_a", "x"), b)
    }
    intercept[IllegalArgumentException] {
      Dedup.pairConsensus(a, a) // colliding score column
    }
    intercept[IllegalArgumentException] {
      Dedup.pairConsensus(a, b, "same", "same")
    }
  }

  test("crossModalDupAudit: one verdict per duplication class; normalization pins caption identity") {
    import graft.ops.Multimodal
    def block(s: Int): String =
      (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
    val (a, b, c, d) = (block(1), block(2), block(3), block(4))
    val rows = Seq(
      (0L, a, "cap one"), (1L, a, "cap one"),  // exact clone pair
      (2L, a, "other cap"),                    // image A recaptioned
      (3L, b, "cap one"),                      // stock caption across images
      (4L, c, "solo"),                         // both sides unique
      (5L, d, "  CAP   one ")                  // normalizes to 'cap one'
    ).toDF("doc_id", "img", "cap")
    val got = Multimodal.crossModalDupAudit(
        rows.select(col("doc_id"), encode(col("img"), "utf-8").as("payload"),
          col("cap")), "doc_id", "payload", "cap")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4), r._5)).toMap
    assert(got(0L) == (((2L, 2L, 3L), "exact_dup")))
    assert(got(1L) == (((2L, 2L, 3L), "exact_dup")))
    assert(got(2L) == (((1L, 2L, 1L), "recaptioned")))
    assert(got(3L) == (((1L, 1L, 3L), "stock_caption")))
    assert(got(4L) == (((1L, 1L, 1L), "ok")))
    assert(got(5L) == (((1L, 1L, 3L), "stock_caption")),
      "whitespace/case variants share the caption identity")
    // a NULL on either side surfaces as 'missing' — never silently
    // absent from the audit, never joined into the count groups
    val withNulls = Seq(
      (0L, Option(a), Option("cap one")),
      (6L, Option(a), None),          // null caption
      (7L, None, Option("cap one"))   // null payload
    ).toDF("doc_id", "img", "cap")
    val nGot = Multimodal.crossModalDupAudit(
        withNulls.select(col("doc_id"), encode(col("img"), "utf-8").as("payload"),
          col("cap")), "doc_id", "payload", "cap")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(nGot == Map(0L -> "ok", 6L -> "missing", 7L -> "missing"),
      "null caption/payload rows surface, and don't distort row 0's counts")

    // a non-stub space drops what it cannot decode (audit via
    // payloadIntegrity first): the garbage row exits, the WAV stays
    val wavRows = Seq(
      (0L, Multimodal.packWav("pcm-bytes-payload".getBytes("UTF-8")), "cap"),
      (1L, "notawav".getBytes("UTF-8"), "cap")
    ).toDF("doc_id", "payload", "cap")
    val wavGot = Multimodal.crossModalDupAudit(wavRows, "doc_id", "payload",
        "cap", decoder = Multimodal.WavDecoder)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(wavGot.map(_._1).toSeq == Seq(0L) && wavGot.head._5 == "ok")
  }

  test("sceneChunks: spans ≡ sceneSegments, chunks tile the sampled window, wav extracts first") {
    import graft.ops.Multimodal
    def block(s: Int): String =
      (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
    val body = block(1) * 3 + block(2) * 2 + block(3)
    val rows = Seq((0L, body), (1L, block(4)), (2L, "short"))
      .toDF("doc_id", "t")
    val packed = Multimodal.packBinary(rows, "doc_id", "t")
    val chunks = Multimodal.sceneChunks(packed, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8, cutThreshold = 10)
      .as[(Long, Int, Int, Int, Array[Byte])].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4), r._5)).toMap
    // spans agree with sceneSegments exactly
    val spans = Multimodal.sceneSegments(packed, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8, cutThreshold = 10)
      .as[(Long, Int, Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(chunks.view.mapValues(_._1).toMap == spans)
    // chunk bytes are the scene's exact byte span
    assert(new String(chunks((0L, 0))._2, "UTF-8") == block(1) * 3)
    assert(new String(chunks((0L, 1))._2, "UTF-8") == block(2) * 2)
    assert(new String(chunks((0L, 2))._2, "UTF-8") == block(3))
    // with stride == frameBytes the chunks REBUILD the sampled window
    val rebuilt = chunks.filter(_._1._1 == 0L).toSeq.sortBy(_._1._2)
      .map(c => new String(c._2._2, "UTF-8")).mkString
    assert(rebuilt == body, "contiguous chunks reassemble the clip")
    assert(!chunks.keySet.exists(_._1 == 2L), "sub-frame payloads yield nothing")
    // the wav space slices the EXTRACTED pcm, not the container
    val wavChunks = Multimodal.sceneChunks(
        Seq((7L, Multimodal.packWav(body.getBytes("UTF-8"),
          withListChunk = true))).toDF("doc_id", "payload"),
        "doc_id", "payload", frameBytes = 128, stride = 128, maxFrames = 8,
        cutThreshold = 10, decoder = Multimodal.WavDecoder)
      .as[(Long, Int, Int, Int, Array[Byte])].collect()
    assert(new String(wavChunks.minBy(_._2)._5, "UTF-8") == block(1) * 3)
    val eImg = intercept[IllegalArgumentException] {
      Multimodal.sceneChunks(packed, "doc_id", "payload",
        decoder = Multimodal.ImageioDecoder)
    }
    assert(eImg.getMessage.contains("splitImageFrames"))
  }

  test("sceneSegments in the wav space: segmentation runs over the RIFF-extracted PCM") {
    import graft.ops.Multimodal
    def block(s: Int): String =
      (0 until 128).map(j => ('a' + ((s * 31 + j * 17 + s * j) % 26)).toChar).mkString
    val pcm = (block(1) * 2 + block(5)).getBytes("UTF-8")
    val wavs = Seq(
      (0L, Multimodal.packWav(pcm)),
      (1L, Multimodal.packWav(pcm, withListChunk = true)), // layout variance
      (2L, "notawav".getBytes("UTF-8"))                    // extracts empty
    ).toDF("doc_id", "payload")
    val got = Multimodal.sceneSegments(wavs, "doc_id", "payload",
        frameBytes = 128, stride = 128, maxFrames = 8, cutThreshold = 10,
        decoder = Multimodal.WavDecoder)
      .as[(Long, Int, Int, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5)).toMap
    // both containers segment the SAME pcm: scene 0 = frames 0-1, scene 1 = frame 2
    for (id <- Seq(0L, 1L)) {
      assert(got((id, 0)) == ((0, 1, 2L)), s"clip $id opening scene")
      assert(got((id, 1)) == ((2, 2, 1L)), s"clip $id closing scene")
    }
    assert(!got.keySet.exists(_._1 == 2L), "a non-WAV payload yields no frames")
  }

}
