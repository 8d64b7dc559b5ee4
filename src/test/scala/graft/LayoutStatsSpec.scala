package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrderExprs
import graft.ops.{Corpus, Dedup, Layout, Scrub, Stats}

/** Round-5 depth operators: PII scrubbing, Morton/Z-order layout keys,
  * Tukey-fence outliers, cross-document duplicated spans, and source
  * vocabulary overlap. */
class LayoutStatsSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  // ---- Scrub ----

  test("piiMask masks emails, IPs, phones, and digit runs; leaves short digits") {
    val rows = Seq(
      "mail me at john.doe+x@sub.example.org today",
      "call 25-989-741-2988 or 202 555 0173 now",
      "account 123456789 balance 42 pin 12345",
      "v2.1 released 2024-01-15",
      "from 192.168.0.1 and 10.0.0.255, dotted phone 202.555.0173 stays phone").toDF("t")
      .select(Scrub.piiMask(col("t")).as("m")).as[String].collect()
    assert(rows(0) == "mail me at <EMAIL> today")
    assert(rows(1) == "call <PHONE> or <PHONE> now")
    // 42 and 12345 are under the 6-digit threshold and survive
    assert(rows(2) == "account <ID> balance 42 pin 12345")
    // separator-structured digit groups mask as phone-like — the
    // documented (and standard) date false-positive of regex PII passes
    assert(rows(3) == "v2.1 released <PHONE>")
    // dotted QUADS are IPs (matched before the phone rule, which a quad
    // also satisfies); a 3-group dotted run is still a phone
    assert(rows(4) == "from <IP> and <IP>, dotted phone <PHONE> stays phone")
  }

  test("piiMask replacement tokens are fixed points (no re-matching)") {
    val once = Seq("a 1234567 b x@y.zz c 12-345-678-9012").toDF("t")
      .select(Scrub.piiMask(col("t")).as("m")).as[String].collect()(0)
    val twice = Seq(once).toDF("t")
      .select(Scrub.piiMask(col("t")).as("m")).as[String].collect()(0)
    assert(once == "a <ID> b <EMAIL> c <PHONE>")
    assert(twice == once)
  }

  test("piiCensus counts docs and matches per rule, independently on raw text") {
    val docs = Seq(
      // two emails, and each email's digits are NOT digit-run matches
      // (too short) — but the census counts RULES INDEPENDENTLY, so the
      // standalone 7-digit run below registers even though the mask
      // would also see it
      ("s1", "a@b.co and c@d.org plus 1234567"),
      ("s1", "bare text, no pii at all"),
      ("s2", "ip 10.0.0.1 phone 202 555 0173 and 202-555-0199")).toDF("source", "t")
    val got = Scrub.piiCensus(docs, "source", "t")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(("s1", "email")) == (1L, 2L))     // one doc, two matches
    assert(got(("s1", "digit_run")) == (1L, 1L))
    assert(got(("s1", "phone")) == (0L, 0L))
    assert(got(("s1", "ip")) == (0L, 0L))
    assert(got(("s2", "ip")) == (1L, 1L))
    assert(got(("s2", "phone")) == (1L, 2L))
    assert(got(("s2", "email")) == (0L, 0L))
    // every (group, rule) cell is present even at zero — the decision
    // table has no holes
    assert(got.size == 8)
  }

  // ---- ngramDiversity ----

  test("ngramDiversity: totals by arithmetic, distincts collapse repetition") {
    val docs = Seq(
      // "a b a b": 4 unigrams (2 distinct), 3 bigrams (2 distinct: "a b" ×2, "b a")
      ("s1", "a b a b"),
      // "a b c": adds distinct "c"; bigrams "a b" (dup of doc1's), "b c"
      ("s1", "a b c"),
      // one-token source: zero bigram/trigram mass → null ratio
      ("s2", "solo")).toDF("source", "t")
    val got = graft.ops.Corpus.ngramDiversity(docs, "source", "t")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double])))
      .toMap
    assert(got(("s1", 1)) == (7L, 3L, Some(math.round(3.0 / 7 * 1e6) / 1e6)))
    assert(got(("s1", 2)) == (5L, 3L, Some(0.6)))
    // trigrams: doc1 "a b a","b a b" + doc2 "a b c" → 3 total+... doc1 has 2, doc2 has 1 → 3 grams, 3 distinct
    assert(got(("s1", 3)) == (3L, 3L, Some(1.0)))
    assert(got(("s2", 1)) == (1L, 1L, Some(1.0)))
    assert(got(("s2", 2)) == (0L, 0L, None))
    assert(got(("s2", 3)) == (0L, 0L, None))
  }

  test("ngramDiversityApprox: exact totals, sketch distincts within rsd slack") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = graft.ops.Corpus.ngramDiversity(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val approx = graft.ops.Corpus.ngramDiversityApprox(docs, "source", "text",
        rsd = 0.05)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(approx.keySet == exact.keySet)
    for ((k, (tot, dist)) <- exact) {
      assert(approx(k)._1 == tot, s"$k: totals must stay EXACT")
      // HLL++ rsd 0.05 → allow 5 sigma; distinct counts here are 10²–10⁴
      val slack = math.max(8.0, 0.25 * dist)
      assert(math.abs(approx(k)._2 - dist) <= slack,
        s"$k: sketch ${approx(k)._2} vs exact $dist")
    }
  }

  test("ngramDiversity: replicating a doc grows totals, never distincts") {
    val base = Seq(("s", "w x y z w x")).toDF("source", "t")
    val rep = Seq.fill(4)(("s", "w x y z w x")).toDF("source", "t")
    val a = graft.ops.Corpus.ngramDiversity(base, "source", "t")
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    val b = graft.ops.Corpus.ngramDiversity(rep, "source", "t")
      .collect().map(r => r.getInt(1) -> (r.getLong(2), r.getLong(3))).toMap
    for (n <- 1 to 3) {
      assert(b(n)._1 == 4 * a(n)._1, s"n=$n totals scale with replication")
      assert(b(n)._2 == a(n)._2, s"n=$n distincts are replication-invariant")
    }
  }

  test("labelAgreement: confusion counts plus within-label shares") {
    import graft.ops.TextAnalysis
    val rows = Seq(("en", "en"), ("en", "en"), ("en", "en"), ("en", "und"),
      ("de", "und"), ("de", "und")).toDF("lab", "pred")
    val got = TextAnalysis.labelAgreement(rows, "lab", "pred")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got(("en", "en")) == (3L, 0.75))
    assert(got(("en", "und")) == (1L, 0.25))
    assert(got(("de", "und")) == (2L, 1.0))
    assert(got.size == 3)
  }

  test("sourceJaccardSketch: exact pairs graded by the md5-min estimator") {
    // s1 ≡ s2 (identical shingle sets), s3 shares one of two shingles
    // with both, s4 disjoint (must not be emitted at all)
    val docs = Seq(
      ("s1", "a b c d e f"), ("s2", "a b c d e f"),
      ("s3", "a b c d e x"), ("s4", "p q r s t u")).toDF("source", "t")
    val got = Corpus.sourceJaccardSketch(docs, "source", "t", n = 5, k = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    // identical sets: exact 1, every seed's min agrees, zero error
    assert(got(("s1", "s2")) == (2L, 1.0, 1.0, 0.0))
    // the estimator is replayed by hand: per seed, min md5("i|shingle")
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val a = Set("a b c d e", "b c d e f")
    val b = Set("a b c d e", "b c d e x")
    val wantEst = (0 until 8).count(i =>
      a.map(x => md5hex(s"$i|$x")).min == b.map(x => md5hex(s"$i|$x")).min) / 8.0
    val (c13, j13, e13, err13) = got(("s1", "s3"))
    assert(c13 == 1L && j13 == 1.0 / 3)
    assert(e13 == wantEst, s"estimator must be the deterministic md5-min draw")
    assert(err13 == math.abs(wantEst - 1.0 / 3))
    // disjoint pair never materializes (est and exact both identically 0)
    assert(!got.keySet.exists { case (x, y) => x == "s4" || y == "s4" })
  }

  // ---- Shard.manifest ----

  test("manifest is order- and partitioning-invariant, content-sensitive") {
    import graft.ops.Shard
    val docs = (0L until 40L).map(i => (i, s"doc $i body ${"w " * (i % 7).toInt}", 2 + i % 7))
      .toDF("doc_id", "text", "n_tokens")
    val assigned = Shard.balancedAssign(docs, "doc_id", "n_tokens", nShards = 4)
    val m1 = Shard.manifest(assigned, "doc_id", "text", "n_tokens")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // shuffled row order + different partitioning → identical manifest
    val m2 = Shard.manifest(assigned.orderBy(rand(7)).repartition(13),
        "doc_id", "text", "n_tokens")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m1 == m2)
    assert(m1.keySet == Set(0, 1, 2, 3))
    assert(m1.values.map(_._1).sum == 40L)
    // a one-character content edit moves exactly its shard's hash, and
    // only the hash (counts unchanged)
    val edited = assigned.withColumn("text",
      when(col("doc_id") === 17L, concat(col("text"), lit("!"))).otherwise(col("text")))
    val m3 = Shard.manifest(edited, "doc_id", "text", "n_tokens")
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val editedShard = assigned.filter(col("doc_id") === 17L)
      .select(col("shard")).head().getInt(0)
    for (s <- 0 to 3) {
      assert((m3(s) == m1(s)) == (s != editedShard), s"shard $s")
      assert(m3(s)._1 == m1(s)._1 && m3(s)._2 == m1(s)._2)
    }
    // manifestDiff names exactly that shard, flags it hash-only (the
    // silent-edit signature: counts equal, content not), and a shard
    // present on one side only reads added/removed
    val mfNew = Shard.manifest(edited, "doc_id", "text", "n_tokens")
    val mfOld = Shard.manifest(assigned, "doc_id", "text", "n_tokens")
    val diff = Shard.manifestDiff(mfNew, mfOld.filter(col("shard") =!= 3))
      .collect().map(r => r.getInt(0) -> (r.getString(1), r.getBoolean(10))).toMap
    for (s <- 0 to 3) {
      val expect =
        if (s == 3) ("added", false)
        else if (s == editedShard) ("changed", true)
        else ("equal", false)
      assert(diff(s) == expect, s"shard $s: ${diff(s)} vs $expect")
    }
    val rem = Shard.manifestDiff(mfNew.filter(col("shard") =!= 2), mfOld)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(rem(2) == "removed")
  }

  // ---- InterleaveBits / Layout ----

  /** Reference model: bit-by-bit interleave on the driver. */
  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("interleaveBits matches the driver model, incl. negatives and edges") {
    val cases = Seq(0L -> 0L, 1L -> 0L, 0L -> 1L, 255L -> 255L, 170L -> 85L,
      -1L -> 0L, Long.MaxValue -> Long.MinValue, 12345L -> 54321L)
    val got = cases.toDF("x", "y")
      .select(ZOrderExprs.interleaveBits(col("x"), col("y"), 8).as("z"))
      .as[Long].collect()
    cases.zip(got).foreach { case ((x, y), z) =>
      assert(z == morton(x, y, 8), s"($x, $y)")
    }
  }

  test("interleaveBits equals the composed-builtin form (codegen cross-check)") {
    // the same interleave built from 2·bits shift/and Column expressions —
    // a second, independent evaluation path through Catalyst
    def composed(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column, bits: Int) =
      (0 until bits).map { i =>
        (shiftleft(shiftright(x, i).bitwiseAND(1), 2 * i) +
          shiftleft(shiftright(y, i).bitwiseAND(1), 2 * i + 1)).cast("long")
      }.reduce(_ + _)
    val df = spark.range(0, 2000).select(
      (col("id") * 2654435761L % 1024).as("x"), (col("id") * 40503L % 1024).as("y"))
    val diff = df.select(
        ZOrderExprs.interleaveBits(col("x"), col("y"), 10).as("a"),
        composed(col("x"), col("y"), 10).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L)
  }

  test("zorder key walks the true Z-curve (x on even bits)") {
    val zs = (0 until 16).flatMap(x => (0 until 16).map(y => (x, y)))
      .sortBy { case (x, y) => morton(x, y, 4) }
    // the canonical Z-curve prefix — pins the bit assignment (x even,
    // y odd), which a transposed or row-major flattening would break
    assert(zs.take(8) == Seq((0, 0), (1, 0), (0, 1), (1, 1),
      (2, 0), (3, 0), (2, 1), (3, 1)))
    // and the locality property the layout exists for: most consecutive
    // steps stay within manhattan distance 3 in BOTH dims (measured
    // 87.8% on a 16×16 grid; a diagonal-oblivious order like column-major
    // concentrates distance in one dim instead)
    val jumps = zs.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      (x2 - x1).abs + (y2 - y1).abs }.toSeq
    assert(jumps.count(_ <= 3) >= (jumps.size * 0.85).toInt)
  }

  test("zorderLayout range-partitions and sorts by the morton key") {
    val df = spark.range(0, 10000).select(
      (col("id") % 97).as("x"), (col("id") % 89).as("y"), col("id"))
    val out = Layout.zorderLayout(df, "x", "y", 7, partitions = 4)
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("Exchange rangepartitioning"), p)
    assert(p.contains("Sort [_z"), p)
    // each output partition holds a contiguous, internally-sorted z-range
    val perPart = out.select(Layout.zorderKey(col("x"), col("y"), 7).as("z"))
      .rdd.mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq))
      .collect().filter(_.nonEmpty)
    perPart.foreach(zs => assert(zs == zs.sorted, "sorted within partition"))
    val ranges = perPart.map(zs => (zs.head, zs.last)).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, "disjoint partition ranges")
      case _ =>
    }
  }

  test("zorderLayout shrinks per-file min/max ranges in BOTH dims (the pruning evidence)") {
    // uniform 200×200 grid of (x, y); a hash-scattered write covers
    // ~the whole domain in every file, a z-clustered write covers a
    // small tile — per-file min/max stats become selective on either
    // column, which is exactly what row-group pruning reads
    val df = spark.range(0, 40000).select(
      (col("id") * 7919 % 200).as("x"), (col("id") * 104729 % 200).as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    Layout.zorderLayout(df, "x", "y", 8, partitions = 16)
      .write.mode("overwrite").parquet(s"$base/clustered")
    df.repartition(16).write.mode("overwrite").parquet(s"$base/scattered")
    def spans(dir: String, c: String): Seq[Long] =
      new java.io.File(dir).listFiles.filter(_.getName.endsWith(".parquet")).toSeq
        .map { f =>
          val r = spark.read.parquet(f.getAbsolutePath)
            .agg(min(col(c)), max(col(c))).head
          r.getLong(1) - r.getLong(0)
        }
    def avg(xs: Seq[Long]): Double = xs.sum.toDouble / xs.size
    for (c <- Seq("x", "y")) {
      val clustered = avg(spans(s"$base/clustered", c))
      val scattered = avg(spans(s"$base/scattered", c))
      assert(clustered < 0.5 * scattered,
        s"$c: clustered files should cover tiles, got avg span $clustered vs $scattered")
    }
    // and nothing was lost in the rearrangement
    assert(spark.read.parquet(s"$base/clustered").count() == 40000L)
  }

  // ---- Stats ----

  test("quartileScores assigns 1-4 by the column's own quartiles, strict at boundaries") {
    // 1..8: quartiles 2.75 / 4.5 / 6.25 → scores 1,1,2,2,3,3,4,4
    val got = (1 to 8).map(_.toDouble).toDF("v")
      .transform(df => Stats.quartileScores(df, Seq("v")))
      .orderBy("v").select("v_score").as[Int].collect().toSeq
    assert(got == Seq(1, 1, 2, 2, 3, 3, 4, 4))
    // a value EXACTLY on a quartile scores low (strict >): 4 values all
    // equal → every quartile == v → everyone scores 1
    val ties = Seq(5.0, 5.0, 5.0, 5.0).toDF("v")
      .transform(df => Stats.quartileScores(df, Seq("v")))
      .select("v_score").as[Int].collect().toSeq
    assert(ties == Seq(1, 1, 1, 1))
  }

  test("null hygiene: masks pass nulls through, stats ops drop null values") {
    val masked = Seq((1L, Option("a 1234567 b")), (2L, None))
      .toDF("id", "t").select(col("id"), Scrub.piiMask(col("t")).as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(masked == Map(1L -> Some("a <ID> b"), 2L -> None))

    val vals = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(100.0)), ("a", None)).toDF("g", "v")
    // null rows neither crash the quartiles nor appear as outliers
    val out = Stats.iqrOutliers(vals, "g", "v").select("v").as[Double].collect()
    assert(out.toSeq == Seq(100.0))
    // and no null bucket row in the histogram
    val hist = Stats.equiDepthHistogram(vals, "v", 2).collect()
    assert(hist.forall(!_.isNullAt(0)) && hist.map(_.getLong(1)).sum == 4L)
  }

  test("equiDepthHistogram buckets hold ~equal counts with ordered ranges") {
    val got = (1 to 100).map(_.toDouble).toDF("v")
      .transform(df => Stats.equiDepthHistogram(df, "v", 4))
      .orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1, 2, 3, 4))
    assert(got.map(_._2).forall(_ == 25L), got.mkString(","))
    // ranges tile the domain in order without overlap
    got.sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 < lo2)
      case _ =>
    }
  }

  test("iqrOutliers flags exactly the Tukey-fence violations per group") {
    // group a: 1..11 plus 100 — p25 = 3.75, p75 = 9.25, fences [-4.5, 17.5]
    val a = (1 to 11).map(v => ("a", v.toDouble)) :+ ("a", 100.0)
    // group b: tight cluster, no outliers
    val b = (1 to 12).map(v => ("b", 50.0 + (v % 3)))
    val got = Stats.iqrOutliers((a ++ b).toDF("g", "v"), "g", "v")
      .select(col("g"), col("v")).as[(String, Double)].collect().toSet
    assert(got == Set(("a", 100.0)))
  }

  test("iqrOutliers broadcasts the fence table (fact side never shuffles)") {
    val df = (1 to 100).map(v => (s"g${v % 3}", v.toDouble)).toDF("g", "v")
    val p = Stats.iqrOutliers(df, "g", "v").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  // ---- Dedup.dupSpanFrac ----

  test("dupSpanFrac scores shared spans, not within-doc repeats") {
    val docs = Seq(
      (0L, "a b c d e"),     // grams: abc bcd cde — abc shared with doc 1
      (1L, "a b c x y"),     // grams: abc bcx cxy — abc shared
      (2L, "p q r p q r"),   // within-doc repeat only: pqr qrp rpq pqr — NOT cross-doc
      (3L, "z z")            // < 3 words: no grams, no row
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanFrac(docs, "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList.sortBy(_._1)
    assert(got == List((0L, 3L, 1.0 / 3), (1L, 3L, 1.0 / 3), (2L, 4L, 0.0)))
  }

  // ---- Corpus.sourceOverlap ----

  test("sourceOverlap computes pairwise vocabulary Jaccard") {
    val docs = Seq(
      ("s1", "a b c"), ("s1", "c d"),     // vocab s1 = {a b c d}
      ("s2", "c d e"),                    // vocab s2 = {c d e}
      ("s3", "x y")                       // vocab s3 = {x y} — disjoint
    ).toDF("source", "text")
    val got = Corpus.sourceOverlap(docs, "source", "text")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    // s1∩s2 = {c d}: 2 / (4+3-2) = 0.4; disjoint pairs produce no row
    assert(got == Map(("s1", "s2") -> ((2L, 0.4))))
  }
}
