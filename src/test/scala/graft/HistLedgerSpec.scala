package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.HistLedger

/** The standing histogram ledger (round-9): exact mergeable bucket
  * counts, quantile brackets, the TV drift gate, and the card-ledger
  * store discipline (founding geometry, horizon guard, compaction). */
class HistLedgerSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .select(col("doc_id"), col("lang"),
      graft.ops.TextAnalysis.tokenCount(col("text")).as("n"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long)].collect().toSet

  test("bucketOf pins under/overflow and the hi-edge ulp to the declared buckets") {
    val d = Seq(-0.5, 0.0, 9.999, 10.0, 199.999, 200.0, 1e9)
      .toDF("v").select(col("v"),
        HistLedger.bucketOf(col("v"), 0.0, 200.0, 20).as("b"))
      .as[(Double, Long)].collect().toMap
    assert(d(-0.5) == -1L)      // underflow
    assert(d(0.0) == 0L)
    assert(d(9.999) == 0L)
    assert(d(10.0) == 1L)       // exact edge goes up
    assert(d(199.999) == 19L)   // last real bucket
    assert(d(200.0) == 20L)     // overflow at hi inclusive
    assert(d(1e9) == 20L)
  }

  test("mergedOf over per-batch sketches equals the one-shot histogram of the union") {
    val parts = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    val merged = HistLedger.mergedOf(
      parts.map(HistLedger.sketch(_, "lang", "n", 0.0, 200.0, 20)))
    val oneShot = HistLedger.sketch(docs, "lang", "n", 0.0, 200.0, 20)
    assert(rows(merged) == rows(oneShot),
      "bucket counts must merge exactly — no estimate slack")
  }

  test("ledger round-trip: append/merged from disk ≡ in-memory; replay overwrites; geometry founded") {
    val dir = java.nio.file.Files.createTempDirectory("histledger").toString
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    HistLedger.append(spark, dir, b0, "lang", "n", 0L, 0.0, 200.0, 20)
    HistLedger.append(spark, dir, b1, "lang", "n", 1L, 0.0, 200.0, 20)
    assert(rows(HistLedger.merged(spark, dir)) ==
      rows(HistLedger.sketch(docs, "lang", "n", 0.0, 200.0, 20)))
    // at-least-once replay of the SAME batch id: overwrite, not double-count
    HistLedger.append(spark, dir, b1, "lang", "n", 1L, 0.0, 200.0, 20)
    assert(rows(HistLedger.merged(spark, dir)) ==
      rows(HistLedger.sketch(docs, "lang", "n", 0.0, 200.0, 20)))
    // a restated geometry cannot merge — fail loudly
    val e = intercept[IllegalArgumentException] {
      HistLedger.append(spark, dir, b0, "lang", "n", 2L, 0.0, 100.0, 20)
    }
    assert(e.getMessage.contains("founded"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("compact folds invariantly, below-horizon append fails loudly, horizon replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("histcompact").toString
    (0 to 3).foreach(i => HistLedger.append(spark, dir,
      docs.filter(col("doc_id") % 4 === i), "lang", "n", i.toLong, 0.0, 200.0, 20))
    val before = rows(HistLedger.merged(spark, dir))
    HistLedger.compact(spark, dir, upTo = 2L)
    def dirNames() = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirNames() == Seq("batch=2", "batch=3"), s"got ${dirNames()}")
    assert(rows(HistLedger.merged(spark, dir)) == before,
      "counts sum associatively — the fold must not move one count")
    // horizon-batch replay: no-op (its mass lives in the snapshot)
    HistLedger.append(spark, dir,
      docs.filter(col("doc_id") % 4 === 2), "lang", "n", 2L, 0.0, 200.0, 20)
    assert(rows(HistLedger.merged(spark, dir)) == before)
    // strictly below the horizon: loud failure, not silent double-count
    val e = intercept[IllegalStateException] {
      HistLedger.append(spark, dir,
        docs.filter(col("doc_id") % 4 === 0), "lang", "n", 0L, 0.0, 200.0, 20)
    }
    assert(e.getMessage.contains("horizon"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("quantilesOf matches the driver model bucket-for-bucket") {
    // hand grid: [0,10)×5 buckets, group 'a' = values 1..10 (one per
    // bucket boundary side), so thresholds land predictably
    val d = (1 to 10).map(i => ("a", i.toDouble)).toDF("g", "v")
    val sk = HistLedger.sketch(d, "g", "v", 0.0, 10.0, 5)
    val got = HistLedger.quantilesOf(sk, Seq(0.5, 0.9, 1.0), 0.0, 10.0, 5)
      .as[(String, Double, Long, Option[Double], Option[Double])]
      .collect().map(r => (r._2, r._3, r._4, r._5)).toSet
    // buckets: [0,2)→1, [2,4)→{2,3}, [4,6)→{4,5}, [6,8)→{6,7}, [8,10)→{8,9}, ovf→10
    // cum: b0=1 b1=3 b2=5 b3=7 b4=9 b5=10; ceil(.5·10)=5→b2, ceil(.9·10)=9→b4, 10→b5
    assert(got == Set(
      (0.5, 2L, Some(4.0), Some(6.0)),
      (0.9, 4L, Some(8.0), Some(10.0)),
      (1.0, 5L, Some(10.0), None)))
  }

  test("tvDistance: 0 on identical, 1 on disjoint support and on one-sided groups, exact on a hand case") {
    val a = Seq(("g", 0L, 3L), ("g", 1L, 1L), ("solo", 0L, 5L))
      .toDF("group", "bucket", "cnt")
    val b = Seq(("g", 0L, 1L), ("g", 2L, 1L), ("dis", 5L, 9L))
      .toDF("group", "bucket", "cnt")
    val tv = HistLedger.tvDistance(a, b)
      .as[(String, Double)].collect().toMap
    // g: A=(3/4, 1/4, 0), B=(1/2, 0, 1/2) → ½(|1/4|+|1/4|+|1/2|) = 0.5
    assert(tv("g") == 0.5)
    assert(tv("solo") == 1.0 && tv("dis") == 1.0)
    val same = HistLedger.tvDistance(a, a).as[(String, Double)].collect().toMap
    assert(same.values.forall(_ == 0.0))
    // disjoint buckets, same group
    val c = Seq(("g", 7L, 4L)).toDF("group", "bucket", "cnt")
    val disj = HistLedger.tvDistance(a.filter(col("group") === "g"), c)
      .as[(String, Double)].collect().toMap
    assert(disj("g") == 1.0)
  }

  test("histLedgerSink maintains the ledger at ingest time; streamed ≡ batch-mode; bounded dirs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ledger = java.nio.file.Files.createTempDirectory("histsink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("histsinkckpt").toString
    val d = docs.as[(Long, String, Long)].collect().toSeq
    val mem = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.EventStream.histLedgerSink(
      mem.toDF().toDF("doc_id", "lang", "n"), "lang", "n",
      ledger, ckpt, 0.0, 200.0, 20, keepLast = 1)
    val thirds = Seq(d.filter(_._1 % 3 == 0), d.filter(_._1 % 3 == 1), d.filter(_._1 % 3 == 2))
    thirds.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    // streamed ledger ≡ the one-shot histogram of everything ingested
    assert(rows(HistLedger.merged(spark, ledger)) ==
      rows(HistLedger.sketch(docs, "lang", "n", 0.0, 200.0, 20)))
    // keepLast=1 compacted on the fly: dirs bounded at ~keepLast+1
    val nDirs = new java.io.File(ledger).listFiles().map(_.getName)
      .count(_.startsWith("batch="))
    assert(nDirs <= 2, s"ingest-time compaction must bound the ledger (got $nDirs dirs)")
    // re-delivery of the last epoch (the foreachBatch crash replay) is a
    // no-op: same id → horizon no-op or same-dir overwrite, never a
    // double count
    val before = rows(HistLedger.merged(spark, ledger))
    HistLedger.append(spark, ledger, thirds(2).toDF("doc_id", "lang", "n"),
      "lang", "n", 2L, 0.0, 200.0, 20, keepLast = 1)
    assert(rows(HistLedger.merged(spark, ledger)) == before)
    Seq(ledger, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
  }

  test("drift reads geometry from the store and scores a batch against history") {
    val dir = java.nio.file.Files.createTempDirectory("histdrift").toString
    HistLedger.append(spark, dir, docs.filter(col("doc_id") % 2 === 0),
      "lang", "n", 0L, 0.0, 200.0, 20)
    // the other half of the same corpus: distributions nearly match
    val tv = HistLedger.drift(spark, dir,
        docs.filter(col("doc_id") % 2 === 1), "lang", "n")
      .as[(String, Double)].collect().toMap
    assert(tv.values.forall(v => v >= 0.0 && v < 0.5),
      s"same-corpus halves should not read as drifted: $tv")
    // a shifted batch (all lengths forced into the overflow bucket) drifts hard
    val shifted = docs.filter(col("doc_id") % 2 === 1)
      .withColumn("n", col("n") + 100000L)
    val tv2 = HistLedger.drift(spark, dir, shifted, "lang", "n")
      .as[(String, Double)].collect().toMap
    assert(tv2.values.forall(_ > 0.9), s"shifted batch must drift: $tv2")
    // no store → loud failure
    val e = intercept[IllegalStateException] {
      HistLedger.drift(spark, dir + "/nope", docs, "lang", "n")
    }
    assert(e.getMessage.contains("no histogram ledger"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("driftGatedHistSink quarantines a drifted group before it becomes history") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    def tdir(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val (ledger, scores, quar, ckpt) =
      (tdir("dgs-led"), tdir("dgs-sco"), tdir("dgs-quar"), tdir("dgs-ckpt"))
    val mem = MemoryStream[(Long, String, Long)]
    val q = graft.streaming.EventStream.driftGatedHistSink(
      mem.toDF().toDF("doc_id", "src", "n"), "src", "n",
      ledger, scores, quar, ckpt, maxTv = 0.5, 0.0, 100.0, 10)

    // batch 0 FOUNDS: two healthy sources, values near 20
    val b0 = (0 until 40).map(i => (i.toLong, if (i % 2 == 0) "a" else "b", 20L + i % 5))
    mem.addData(b0: _*); q.processAllAvailable()
    // founding scores are 0.0 and everything is history
    val s0 = spark.read.parquet(s"$scores/batch=0")
      .as[(String, Double)].collect().toMap
    assert(s0 == Map("a" -> 0.0, "b" -> 0.0))
    assert(HistLedger.merged(spark, ledger)
      .agg(sum(col("cnt"))).as[Long].head() == 40L)

    // batch 1: source a stays near 20; source b jumps to 90 (poisoned)
    val b1 = (100 until 140).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", if (i % 2 == 0) 21L else 90L))
    mem.addData(b1: _*); q.processAllAvailable()
    q.stop()
    val s1 = spark.read.parquet(s"$scores/batch=1")
      .as[(String, Double)].collect().toMap
    assert(s1("a") < 0.5 && s1("b") > 0.5, s"scores: $s1")
    // b's poisoned rows sit in quarantine, not in the ledger
    val quarRows = spark.read.parquet(s"$quar/batch=1")
      .as[(Long, String, Long)].collect().toSeq
    assert(quarRows.nonEmpty && quarRows.forall(r => r._2 == "b" && r._3 == 90L))
    val ledgerTotals = HistLedger.merged(spark, ledger)
      .groupBy(col("group")).agg(sum(col("cnt")).as("c"))
      .as[(String, Long)].collect().toMap
    assert(ledgerTotals("a") == 40L) // 20 founding + 20 passing
    assert(ledgerTotals("b") == 20L) // founding only — the poison never landed

    // replay of batch 1 (at-least-once): stored scores are REUSED, the
    // ledger does not double-count, the quarantine stays byte-stable
    val mem2 = MemoryStream[(Long, String, Long)]
    val q2 = graft.streaming.EventStream.driftGatedHistSink(
      mem2.toDF().toDF("doc_id", "src", "n"), "src", "n",
      ledger, scores, quar, tdir("dgs-ckpt2"), maxTv = 0.5, 0.0, 100.0, 10)
    mem2.addData(b0: _*); q2.processAllAvailable() // this sink's batch 0 = replay of id 0
    q2.stop()
    assert(spark.read.parquet(s"$scores/batch=0")
      .as[(String, Double)].collect().toMap == s0)
    assert(HistLedger.merged(spark, ledger)
      .groupBy(col("group")).agg(sum(col("cnt")).as("c"))
      .as[(String, Long)].collect().toMap == ledgerTotals)
    Seq(ledger, scores, quar, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
  }

}
