package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{CacheScope, Dedup}

/** Bloom snapshot layer of the incremental dedup family: one-sided error
  * (no false negatives — a `kept` is definitive), fpp-bounded false
  * positives, row-local probe plan, and exact-path-identical composed
  * verdicts. */
class BloomDedupSpec extends AnyFunSuite {
  private lazy val spark = Golden.spark
  import spark.implicits._

  private def doc(i: Int) = s"document number $i with body text ${i * 7} and tail ${i % 13}"

  test("bloomVerdicts: zero false negatives, fpp-bounded false positives") {
    val history = (0 until 500).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val bloom = Dedup.bloomSnapshot(history, "text", expectedItems = 500, fpp = 0.01)
    // batch: 100 true duplicates of history + 400 novel documents
    val batch = ((0 until 100).map(i => (1000L + i, doc(i))) ++
      (0 until 400).map(i => (2000L + i, s"novel text $i never seen ${i * 31}")))
      .toDF("doc_id", "text")
    val verdicts = Dedup.bloomVerdicts(batch, "doc_id", "text", bloom)
      .as[(Long, String)].collect().toMap
    // every true duplicate MUST be flagged (one-sided error)
    (0 until 100).foreach(i => assert(verdicts(1000L + i) == "maybe_dup", s"dup $i"))
    // novel rows: false positives at ~1% fpp; allow 5x slack
    val fps = (0 until 400).count(i => verdicts(2000L + i) == "maybe_dup")
    assert(fps <= 20, s"$fps false positives out of 400 at fpp 0.01")
  }

  test("bloom probe plan is row-local: no join, no exchange, no history scan") {
    val history = (0 until 50).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
    val bloom = Dedup.bloomSnapshot(history, "text", expectedItems = 50)
    // range-backed input: a local Seq would constant-fold the whole
    // verdict into a LocalTableScan and hide the plan under test
    val batch = spark.range(10).select(col("id").as("doc_id"),
      concat(lit("document number "), col("id")).as("text"))
    val p = Dedup.bloomVerdicts(batch, "doc_id", "text", bloom)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join") && !p.contains("Exchange"),
      s"the triage verdict must be one codegen'd scan\n$p")
    assert(p.contains("bloom_might_contain"), p)
  }

  test("incrementalDedupBloom verdicts are bit-identical to the exact path") {
    CacheScope.withScope { scope =>
      val history = (0 until 200).map(i => (i.toLong, doc(i))).toDF("doc_id", "text")
      // batch mixes history dups, within-batch dups, and novel docs
      val batch = (
        (0 until 40).map(i => (1000L + i, doc(i))) ++                 // dup_history
        (0 until 30).map(i => (2000L + i, s"batch-local text ${i / 2}")) ++ // pairs: kept + dup_batch
        (0 until 50).map(i => (3000L + i, s"fresh content $i"))        // kept
      ).toDF("doc_id", "text")
      val bloom = Dedup.bloomSnapshot(history, "text", expectedItems = 200, fpp = 0.01)
      val exact = Dedup.incrementalDedup(batch, "doc_id", "text", history, "text", scope)
        .as[(Long, String)].collect().toMap
      val bloomed = Dedup.incrementalDedupBloom(batch, "doc_id", "text",
        history, "text", bloom, scope).as[(Long, String)].collect().toMap
      assert(bloomed == exact)
      assert(exact.values.count(_ == "dup_history") == 40)
      assert(exact.values.count(_ == "dup_batch") == 15)
    }
  }
}
