package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: do the curation operators scale? Replays the sf0.1
  * documents table K× (doc_ids offset per copy, content identical) and
  * times each op at 1× and K×.
  *
  * Replication is deliberately ADVERSARIAL for these ops:
  *  - boilerplateRemove: every chunk now occurs in ≥ K distinct docs, so
  *    the "small by construction" boilerplate set degrades to ALL
  *    distinct chunks — the template-farm worst case. The broadcast
  *    stays bounded by the DISTINCT-chunk table (which replication does
  *    not grow), so the op should still scale ~linearly in corpus size.
  *  - fuzzyDupPairs: every block's membership grows K×, so within-block
  *    pair work grows K² — the documented quadratic term. Run with a
  *    smaller K and watch the super-linear growth show up honestly.
  *  - temperatureMix: one narrow count shuffle; should be flat-ish.
  *
  * Usage: sbt "Test/runMain graft.CurationScaleMain [K]"   (default 16)
  */
object CurationScaleMain {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 16
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"))
    val n = base.count()
    def replay(copies: Int): DataFrame =
      (0 until copies).map(i =>
        base.select((col("doc_id") + lit(i.toLong * n)).as("doc_id"),
          col("text"), col("lang")))
        .reduce(_ unionAll _)

    def time(what: String, df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCALE $what: $sec%.2f s ($rows rows)")
      sec
    }

    val blockKey = Seq(col("lang"),
      element_at(split(lower(trim(col("text"))), "\\s+"), 1))
    for ((label, copies) <- Seq("1x" -> 1, s"${k}x" -> k)) {
      val docs = replay(copies)
      time(s"boilerplate  $label",
        graft.ops.Dedup.boilerplateRemove(docs, "doc_id", "text", 10, 2))
      time(s"tempMix      $label",
        graft.ops.Corpus.temperatureMix(docs, "lang", 0.5, 1000L))
    }
    // quadratic-by-design: smaller replay, growth factor is the message —
    // and the round-8 maxBlockSize cap is the escape: replication grows
    // every block K×, but the capped run's per-block work (and the pair
    // output) stays bounded at the cap no matter how the corpus grows
    val fk = math.max(2, k / 4)
    for ((label, copies) <- Seq("1x" -> 1, s"${fk}x" -> fk)) {
      val docs = replay(copies)
      time(s"fuzzyPairs   $label",
        graft.ops.Dedup.fuzzyDupPairs(docs, "doc_id", "text", blockKey, 20, 80))
      graft.ops.CacheScope.withScope { scope =>
        time(s"fuzzyCapped  $label",
          graft.ops.Dedup.fuzzyDupPairs(docs, "doc_id", "text", blockKey, 20, 80,
            maxBlockSize = 25, scope = scope))
      }
    }
    spark.stop()
  }
}
