package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

/** Selectable approx flavors of the percentile family (round-5 verdict
  * #6): at a sketch accuracy above the row count the rank sketch is
  * exact, so the approx flavor must REPLAY the exact operator; at a
  * coarse accuracy the divergence must stay inside the sketch's rank
  * error — quantified here against the exact path at sf0.01, the
  * datasetCardApprox discipline. */
class ApproxStatsSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .select(col("doc_id"), col("lang"), col("n_chars"))

  test("high-accuracy approx flavors replay the exact operators") {
    // 500 rows << accuracy 10000: approx_percentile degenerates to exact
    // rank selection; note the flavors still differ on interpolation
    // (exact interpolates between neighbors, the sketch returns an
    // observed value), so compare downstream DECISIONS, not quantiles
    val exactOut = Stats.iqrOutliers(docs, "lang", "n_chars")
      .select(col("doc_id")).as[Long].collect().toSet
    val approxOut = Stats.iqrOutliersApprox(docs, "lang", "n_chars",
        accuracy = 10000)
      .select(col("doc_id")).as[Long].collect().toSet
    // fences built from observed values vs interpolated values can flip
    // only rows between the two fence pairs; on this data none flip
    assert(approxOut == exactOut)

    val exScores = Stats.quartileScores(docs, Seq("n_chars"))
      .select(col("doc_id"), col("n_chars_score")).as[(Long, Int)].collect().toMap
    val apScores = Stats.quartileScoresApprox(docs, Seq("n_chars"), accuracy = 10000)
      .select(col("doc_id"), col("n_chars_score")).as[(Long, Int)].collect().toMap
    val scoreDiff = exScores.count { case (id, s) => apScores(id) != s }
    assert(scoreDiff <= (exScores.size * 0.02).toInt,
      s"interpolation-only drift must touch almost no rows: $scoreDiff differ")

    val exH = Stats.equiDepthHistogram(docs, "n_chars", 8)
      .select(col("bucket"), col("n")).as[(Int, Long)].collect().toMap
    val apH = Stats.equiDepthHistogramApprox(docs, "n_chars", 8, accuracy = 10000)
      .select(col("bucket"), col("n")).as[(Int, Long)].collect().toMap
    assert(apH.values.sum == exH.values.sum, "every row lands in some bucket")
    assert(apH.keySet == exH.keySet)
    apH.foreach { case (b, n) =>
      assert(math.abs(n - exH(b)) <= 2, s"bucket $b: $n vs ${exH(b)}") }
  }

  test("coarse-accuracy divergence stays inside the sketch rank error") {
    val n = docs.count()
    // accuracy 20 → rank error ~ n/20 = 5% of rows
    val tol = math.ceil(n / 20.0).toLong

    // equi-depth: bucket populations within the rank error of the exact
    // k-quantile splits; totals conserved
    val exH = Stats.equiDepthHistogram(docs, "n_chars", 5)
      .select(col("bucket"), col("n")).as[(Int, Long)].collect().toMap
    val apH = Stats.equiDepthHistogramApprox(docs, "n_chars", 5, accuracy = 20)
      .select(col("bucket"), col("n")).as[(Int, Long)].collect().toMap
    assert(apH.values.sum == n)
    apH.foreach { case (b, cnt) =>
      assert(math.abs(cnt - exH.getOrElse(b, 0L)) <= 2 * tol,
        s"bucket $b drifted past the sketch error: $cnt vs ${exH.getOrElse(b, 0L)}") }

    // quartile scores: a coarse sketch can shift a score by one step for
    // rows near a quartile, never more, and never for rows far from one
    val ex = Stats.quartileScores(docs, Seq("n_chars"))
      .select(col("doc_id"), col("n_chars_score")).as[(Long, Int)].collect().toMap
    val ap = Stats.quartileScoresApprox(docs, Seq("n_chars"), accuracy = 20)
      .select(col("doc_id"), col("n_chars_score")).as[(Long, Int)].collect().toMap
    assert(ex.keySet == ap.keySet)
    val diffs = ex.collect { case (id, s) if ap(id) != s => math.abs(ap(id) - s) }
    assert(diffs.forall(_ == 1), "scores can shift by at most one step")
    assert(diffs.size <= 3 * tol, s"${diffs.size} rows shifted — past the rank error")

    // IQR outliers: every verdict flip must sit between the two flavors'
    // fence pairs (the only rows the fence error can reach)
    val exFl = Stats.iqrOutliers(docs, "lang", "n_chars")
      .select(col("doc_id")).as[Long].collect().toSet
    val apFl = Stats.iqrOutliersApprox(docs, "lang", "n_chars", accuracy = 20)
      .select(col("doc_id")).as[Long].collect().toSet
    val flips = (exFl diff apFl) union (apFl diff exFl)
    assert(flips.size <= 3 * tol, s"${flips.size} outlier flips — past the rank error")
  }

  // ---- weightedQuantilesApprox: the bounded-state token-mass flavor ----

  test("weightedQuantilesApprox is one-sided within a bin factor of exact; rejects v <= 0") {
    import graft.ops.Corpus
    val rng = new scala.util.Random(77)
    val rows = (1 to 800).map { _ =>
      (s"g${rng.nextInt(4)}", math.exp(rng.nextGaussian() * 2 + 3), rng.nextInt(9).toLong + 1L)
    }
    val df = spark.createDataFrame(rows).toDF("g", "v", "w")
    val qs = Seq(0.25, 0.5, 0.9, 1.0)
    val exact = Stats.weightedQuantiles(df, "g", "v", "w", qs)
      .as[(String, Double, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val approx = Stats.weightedQuantilesApprox(df, "g", "v", "w", qs)
      .as[(String, Double, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val binFactor = math.pow(2.0, 1.0 / 8)
    assert(approx.keySet == exact.keySet)
    for ((k, ex) <- exact) {
      assert(approx(k) >= ex * (1 - 1e-9), s"$k: approx ${approx(k)} below exact $ex")
      assert(approx(k) <= ex * binFactor * (1 + 1e-9),
        s"$k: approx ${approx(k)} past the bin factor of exact $ex")
    }
    // the card composition at sf0.01: approx token-mass lengths track
    // the exact card columns within the same factor
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val cardEx = Corpus.datasetCardWeighted(docs, "source", "text", "lang")
      .select(col("source"), col("p50_tokens_mass"), col("p90_tokens_mass"))
      .as[(String, Long, Long)].collect().toSeq
    val cardAp = Stats.weightedQuantilesApprox(
        docs.select(col("source"),
          graft.ops.TextAnalysis.tokenCount(col("text")).as("nt")),
        "source", "nt", "nt", Seq(0.5, 0.9))
      .as[(String, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(cardEx.nonEmpty)
    for ((src, p50, p90) <- cardEx) {
      assert(cardAp((src, 0.5)) >= p50 && cardAp((src, 0.5)) <= p50 * binFactor * (1 + 1e-9))
      assert(cardAp((src, 0.9)) >= p90 && cardAp((src, 0.9)) <= p90 * binFactor * (1 + 1e-9))
    }
    // log bins need positive values: a zero must fail loudly, not vanish
    val e = intercept[IllegalArgumentException] {
      Stats.weightedQuantilesApprox(
        spark.createDataFrame(Seq(("a", 0.0, 1L))).toDF("g", "v", "w"),
        "g", "v", "w", Seq(0.5))
    }
    assert(e.getMessage.contains("positive"))
  }

  // ---- cardLedger: the standing HLL distinct-count ledger (round-8) ----

  test("cardLedger estimates the unioned distinct within HLL tolerance, never rescanning batches") {
    import graft.ops.Corpus
    val dir = java.nio.file.Files.createTempDirectory("cardledger").toString
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("source"), md5(col("text")).as("fp"), col("doc_id"))
    // three overlapping batches (thirds by doc_id, plus a shared slice)
    val batches = Seq(
      d.filter(col("doc_id") % 3 === 0),
      d.filter(col("doc_id") % 3 === 1).unionAll(d.filter(col("doc_id") % 30 === 0)),
      d.filter(col("doc_id") % 3 === 2))
    batches.zipWithIndex.foreach { case (b, i) =>
      Corpus.cardLedgerAppend(spark, dir, b, "source", "fp", i.toLong)
    }
    val est = Corpus.cardLedgerEstimate(spark, dir)
      .as[(String, Long)].collect().toMap
    val exact = d.groupBy(col("source").cast("string").as("g"))
      .agg(count_distinct(col("fp")).as("n")).as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    for ((g, n) <- exact)
      assert(math.abs(est(g) - n) <= math.max(2L, (0.05 * n).toLong),
        s"group $g: est ${est(g)} vs exact $n — past HLL(lgK=12) tolerance")
    // double-append of IDENTICAL content under a NEW batch id: HLL union
    // is idempotent, so the estimate must not move by a single count
    Corpus.cardLedgerAppend(spark, dir, batches(0), "source", "fp", 99L)
    val est2 = Corpus.cardLedgerEstimate(spark, dir).as[(String, Long)].collect().toMap
    assert(est2 == est, "re-ingested content inflated the distinct estimate")
    // replay of the SAME batch id overwrites its dir: ledger stays bounded
    Corpus.cardLedgerAppend(spark, dir, batches(1), "source", "fp", 1L)
    val dirs = new java.io.File(dir).listFiles().map(_.getName).count(_.startsWith("batch="))
    assert(dirs == 4, s"replay must overwrite, not accumulate (got $dirs dirs)")
    assert(Corpus.cardLedgerEstimate(spark, dir).as[(String, Long)].collect().toMap == est)
    // a genuinely NEW value set must move the estimate upward
    Corpus.cardLedgerAppend(spark, dir,
      d.select(col("source"), md5(concat(col("fp"), lit("~v2"))).as("fp"), col("doc_id")),
      "source", "fp", 100L)
    val est3 = Corpus.cardLedgerEstimate(spark, dir).as[(String, Long)].collect().toMap
    assert(exact.keys.forall(g => est3(g) > est(g)),
      "doubling the distinct universe must raise every group's estimate")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("cardLedgerCompact folds sub-horizon dirs invariantly; below-horizon appends fail loudly") {
    import graft.ops.Corpus
    val dir = java.nio.file.Files.createTempDirectory("cardcompact").toString
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("source"), md5(col("text")).as("fp"), col("doc_id"))
    def batch(i: Int) = d.filter(col("doc_id") % 4 === i)
    (0 to 3).foreach(i =>
      Corpus.cardLedgerAppend(spark, dir, batch(i), "source", "fp", i.toLong))
    def dirs() = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    val before = Corpus.cardLedgerEstimate(spark, dir)
      .as[(String, Long)].collect().toMap

    // fold batches 0..2 into batch=2; batch=3 untouched
    Corpus.cardLedgerCompact(spark, dir, upTo = 2L)
    assert(dirs() == Seq("batch=2", "batch=3"), s"got ${dirs()}")
    val after = Corpus.cardLedgerEstimate(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(after == before, "HLL union is associative — the fold must not move a single estimate")

    // replaying a SURVIVING id (3) is the idempotent overwrite path...
    Corpus.cardLedgerAppend(spark, dir, batch(3), "source", "fp", 3L)
    assert(Corpus.cardLedgerEstimate(spark, dir)
      .as[(String, Long)].collect().toMap == before)
    // ...replaying the HORIZON id (2) is a NO-OP: its mass is already in
    // the snapshot, and an overwrite would drop batches 0-1's folded mass
    Corpus.cardLedgerAppend(spark, dir, batch(2), "source", "fp", 2L)
    assert(Corpus.cardLedgerEstimate(spark, dir)
      .as[(String, Long)].collect().toMap == before,
      "horizon re-delivery must not replace the snapshot with a raw batch sketch")
    // ...but a FOLDED id (1) lost its dir: silent re-append would reopen
    // the dir creep — it must throw instead (PackOffsetStore discipline)
    val e = intercept[IllegalStateException] {
      Corpus.cardLedgerAppend(spark, dir, batch(1), "source", "fp", 1L)
    }
    assert(e.getMessage.contains("compaction horizon"))
    assert(dirs() == Seq("batch=2", "batch=3"), "the failed append must leave nothing behind")

    // double-append of identical content above the horizon stays safe
    Corpus.cardLedgerAppend(spark, dir, batch(0), "source", "fp", 7L)
    assert(Corpus.cardLedgerEstimate(spark, dir)
      .as[(String, Long)].collect().toMap == before)

    // a second compact folds the new tail onto the same snapshot and a
    // stale staging dir (simulated crash leftover) is self-repaired
    new java.io.File(s"$dir/_compact_tmp").mkdirs()
    Corpus.cardLedgerCompact(spark, dir, upTo = 7L)
    assert(dirs() == Seq("batch=7"))
    assert(!new java.io.File(s"$dir/_compact_tmp").exists())
    assert(Corpus.cardLedgerEstimate(spark, dir)
      .as[(String, Long)].collect().toMap == before)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("cardLedgerSink maintains the ledger at ingest time; streamed == batch-mode; bounded dirs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.Corpus
    implicit val sq = spark.sqlContext
    val ledger = java.nio.file.Files.createTempDirectory("cardsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("cardsinkckpt").toString
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("source").cast("string"), md5(col("text")).as("fp"), col("doc_id"))
      .as[(String, String, Long)].collect().toSeq
    val mem = MemoryStream[(String, String, Long)]
    val q = graft.streaming.EventStream.cardLedgerSink(
      mem.toDF().toDF("source", "fp", "doc_id"), "source", "fp",
      ledger, ckpt, keepLast = 1)
    val thirds = Seq(d.filter(_._3 % 3 == 0), d.filter(_._3 % 3 == 1), d.filter(_._3 % 3 == 2))
    thirds.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // streamed ledger answers ≡ a batch-mode ledger over the same batches
    val batchDir = java.nio.file.Files.createTempDirectory("cardbatch").toString
    thirds.zipWithIndex.foreach { case (b, i) =>
      Corpus.cardLedgerAppend(spark, batchDir,
        b.toDF("source", "fp", "doc_id"), "source", "fp", i.toLong)
    }
    val streamed = Corpus.cardLedgerEstimate(spark, ledger)
      .as[(String, Long)].collect().toMap
    assert(streamed == Corpus.cardLedgerEstimate(spark, batchDir)
      .as[(String, Long)].collect().toMap)
    // ...and within HLL tolerance of the exact distincts over the union
    val exact = d.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).distinct.size.toLong }
    assert(streamed.keySet == exact.keySet)
    for ((g, n) <- exact)
      assert(math.abs(streamed(g) - n) <= math.max(2L, (0.05 * n).toLong))
    // keepLast=1 compacted on the fly: dirs bounded at ~keepLast+1
    val nDirs = new java.io.File(ledger).listFiles().map(_.getName)
      .count(_.startsWith("batch="))
    assert(nDirs <= 2, s"ingest-time compaction must bound the ledger (got $nDirs dirs)")
    // re-delivery of the last epoch (what foreachBatch replays after a
    // crash) is a no-op on the estimate
    Corpus.cardLedgerAppend(spark, ledger,
      thirds(2).toDF("source", "fp", "doc_id"), "source", "fp", 2L, keepLast = 1)
    assert(Corpus.cardLedgerEstimate(spark, ledger)
      .as[(String, Long)].collect().toMap == streamed)
    Seq(ledger, ckpt, batchDir).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
  }

  // ---- Stats.tableProfile / tableProfileApprox ----

  test("tableProfile: exact per-column stats incl. nulls; approx flavor within HLL tolerance") {
    import graft.ops.Stats
    val df = Seq(
      (Option(1L), Option("a")), (Option(2L), Option("b")),
      (Option(2L), None), (Option.empty[Long], Option("a"))
    ).toDF("k", "s")
    val got = Stats.tableProfile(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(got("k") == ((4L, 1L, 2L, "1", "2")))
    assert(got("s") == ((4L, 1L, 2L, "a", "b")))
    // the approx flavor agrees on everything but the sketched distincts,
    // and those sit within the HLL tolerance band
    val ap = Stats.tableProfileApprox(df, Seq("k", "s"))
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(math.abs(ap("k") - 2L) <= 1 && math.abs(ap("s") - 2L) <= 1)
  }

}
