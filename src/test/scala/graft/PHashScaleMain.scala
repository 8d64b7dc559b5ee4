package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev harness: does the perceptual-hash standing store keep its probe
  * flat — and its ANSWERS invariant — as the store replicates? Replays
  * the sf0.1 documents K× (ids offset per copy) into a [[graft.ops
  * .Multimodal.PHashIndex]], then probes the SAME fixed first-byte-mutant
  * batch at 1× and K×.
  *
  * The ASSERTED invariant (not just timed): replicas are byte-identical,
  * hash identically, and tie at equal distance — min_by breaks ties to
  * the LOWEST id, so the probe's (id, hist_id, dist) table at K× must
  * EQUAL the 1× table row-for-row. If growing the store ever changes an
  * answer, the tie-break or the banding broke. Probe wall should ride
  * the batch + true-match volume (replicated matches are the worst
  * case), never the store scan.
  *
  * Usage: sbt "Test/runMain graft.PHashScaleMain [K]"   (default 8)
  */
object PHashScaleMain {
  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(100000).selectExpr("sum(id)").collect()
    import spark.implicits._
    import graft.ops.{CacheScope, Multimodal}

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nd = docs.agg(max("doc_id")).head().getLong(0) + 1
    def replay(copies: Int): DataFrame =
      (0 until copies).map(i =>
        docs.select((col("doc_id") + lit(i.toLong * nd)).as("doc_id"),
          col("text"))).reduce(_ unionAll _)
    // fixed probe batch: first-byte mutants of a 2k slice of the 1× corpus
    val batch = Multimodal.packBinary(
      docs.filter(col("doc_id") % 7 === 1).limit(2000)
        .select((col("doc_id") + 10L * nd).as("doc_id"),
          concat(lit("Z"), expr("substring(text, 2)")).as("text")),
      "doc_id", "text")

    var base: Seq[(Long, Long, Int)] = null
    for ((label, copies) <- Seq("1x" -> 1, s"${k}x" -> k)) {
      CacheScope.withScope { scope =>
        var t0 = System.nanoTime()
        val idx = Multimodal.buildPHashIndex(
          Multimodal.packBinary(replay(copies), "doc_id", "text"),
          "doc_id", "payload", nBands = 4, scope = scope)
        idx.banded.count()
        val buildS = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val got = Multimodal.incrementalPerceptualDupsWith(batch, idx,
            "doc_id", "payload", maxDist = 6, multiProbe = true)
          .as[(Long, Long, Int)].collect().sortBy(_._1).toSeq
        val probeS = (System.nanoTime() - t0) / 1e9
        println(f"$label: build $buildS%.2f s, multiprobe ${got.size} verdicts in $probeS%.2f s")
        if (base == null) base = got
        else {
          // replication invariance: same best matches, same distances —
          // every replica ties and the lowest (original) id wins
          require(got == base,
            s"probe answers changed under store replication: " +
              s"${got.diff(base).take(3)} vs ${base.diff(got).take(3)}")
          println(s"$label: probe table EQUAL to 1x (replication-invariant, " +
            s"${base.size} rows)")
        }
        require(got.nonEmpty && got.forall(_._3 <= 1),
          "every first-byte mutant must find its original within 1 bit")
      }
    }
    spark.stop()
  }
}
