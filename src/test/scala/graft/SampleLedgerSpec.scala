package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SampleLedger

/** The standing inspection-sample ledger (round-9): per-group bottom-k
  * by salted md5, exactly mergeable and content-idempotent, behind the
  * card/histogram store discipline. */
class SampleLedgerSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.01/documents.parquet")
    .select(col("doc_id"), col("lang"), col("source"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("group", "id", "payload", "cap_rank")
      .as[(String, String, String, Long)].collect().toSet

  test("mergedOf over batch sketches ≡ the one-shot bottom-k over the union") {
    val parts = Seq(
      docs.filter(col("doc_id") % 3 === 0),
      docs.filter(col("doc_id") % 3 === 1),
      docs.filter(col("doc_id") % 3 === 2))
    val merged = SampleLedger.mergedOf(
      parts.map(SampleLedger.sketch(_, "lang", "doc_id", "source", 5)), 5)
    val oneShot = graft.ops.TextAnalysis.groupCap(
      docs.select(col("lang").cast("string").as("group"),
        col("doc_id").cast("string").as("id"),
        col("source").cast("string").as("payload")),
      "group", "id", 5, "graft-sample")
    assert(rows(merged) == rows(oneShot))
    // per-group cardinality is exactly min(k, group size)
    val byGroup = merged.groupBy("group").count().as[(String, Long)].collect().toMap
    assert(byGroup.values.forall(_ == 5L), s"got $byGroup")
  }

  test("content-idempotent: re-delivered content under NEW batch ids cannot change the sample") {
    val b0 = SampleLedger.sketch(docs.filter(col("doc_id") % 2 === 0),
      "lang", "doc_id", "source", 5)
    val b1 = SampleLedger.sketch(docs.filter(col("doc_id") % 2 === 1),
      "lang", "doc_id", "source", 5)
    val once = rows(SampleLedger.mergedOf(Seq(b0, b1), 5))
    val doubled = rows(SampleLedger.mergedOf(Seq(b0, b1, b0, b1), 5))
    assert(doubled == once,
      "bottom-k over distinct survivors must absorb duplicate content")
  }

  test("ledger round-trip, founding params, horizon guard, compact invariance") {
    val dir = java.nio.file.Files.createTempDirectory("sampleledger").toString
    (0 to 3).foreach(i => SampleLedger.append(spark, dir,
      docs.filter(col("doc_id") % 4 === i), "lang", "doc_id", "source",
      i.toLong, k = 5))
    val before = rows(SampleLedger.merged(spark, dir))
    // disk merged ≡ in-memory merge of the same four sketches
    val mem = SampleLedger.mergedOf((0 to 3).map(i =>
      SampleLedger.sketch(docs.filter(col("doc_id") % 4 === i),
        "lang", "doc_id", "source", 5)), 5)
    assert(before == rows(mem))
    // founding constants win: a different k or seed fails loudly
    val e1 = intercept[IllegalArgumentException] {
      SampleLedger.append(spark, dir, docs, "lang", "doc_id", "source",
        9L, k = 7)
    }
    assert(e1.getMessage.contains("founded"))
    val e2 = intercept[IllegalArgumentException] {
      SampleLedger.append(spark, dir, docs, "lang", "doc_id", "source",
        9L, k = 5, seed = "other")
    }
    assert(e2.getMessage.contains("founded"))
    // compact folds invariantly; snapshot is ≤ groups × k rows
    SampleLedger.compact(spark, dir, upTo = 2L)
    def dirNames() = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("batch=")).sorted.toSeq
    assert(dirNames() == Seq("batch=2", "batch=3"))
    assert(rows(SampleLedger.merged(spark, dir)) == before)
    // horizon-batch replay no-ops; below-horizon fails loudly
    SampleLedger.append(spark, dir, docs.filter(col("doc_id") % 4 === 2),
      "lang", "doc_id", "source", 2L, k = 5)
    assert(rows(SampleLedger.merged(spark, dir)) == before)
    val e3 = intercept[IllegalStateException] {
      SampleLedger.append(spark, dir, docs.filter(col("doc_id") % 4 === 0),
        "lang", "doc_id", "source", 0L, k = 5)
    }
    assert(e3.getMessage.contains("horizon"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("sampleLedgerSink maintains the sample at ingest; streamed ≡ one-shot; bounded dirs") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val ledger = java.nio.file.Files.createTempDirectory("samplesink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("samplesinkckpt").toString
    val d = docs.as[(Long, String, String)].collect().toSeq
    val mem = MemoryStream[(Long, String, String)]
    val q = graft.streaming.EventStream.sampleLedgerSink(
      mem.toDF().toDF("doc_id", "lang", "source"), "lang", "doc_id", "source",
      ledger, ckpt, k = 5, keepLast = 1)
    val thirds = Seq(d.filter(_._1 % 3 == 0), d.filter(_._1 % 3 == 1), d.filter(_._1 % 3 == 2))
    thirds.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    assert(rows(SampleLedger.merged(spark, ledger)) ==
      rows(SampleLedger.mergedOf(
        Seq(SampleLedger.sketch(docs, "lang", "doc_id", "source", 5)), 5)))
    val nDirs = new java.io.File(ledger).listFiles().map(_.getName)
      .count(_.startsWith("batch="))
    assert(nDirs <= 2, s"ingest-time compaction must bound the ledger (got $nDirs dirs)")
    Seq(ledger, ckpt).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
  }

  test("different seeds draw different samples; the same seed is deterministic") {
    val a = SampleLedger.sketch(docs, "lang", "doc_id", "source", 5).collect().toSet
    val b = SampleLedger.sketch(docs, "lang", "doc_id", "source", 5).collect().toSet
    assert(a == b, "same seed must be deterministic")
    val c = SampleLedger.sketch(docs, "lang", "doc_id", "source", 5,
      seed = "graft-sample-2").collect().toSet
    assert(a != c, "a different seed must be a different permutation")
  }
}
