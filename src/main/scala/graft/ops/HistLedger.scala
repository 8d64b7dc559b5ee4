package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standing score-DISTRIBUTION ledger: the [[Corpus.cardLedgerAppend]]
  * discipline applied to histograms instead of distinct counts. A daily
  * 100 TB ingest loop needs "has the quality-score / doc-length / lang-id
  * distribution drifted from the corpus to date?" every batch — the
  * canary that catches a broken extractor or a poisoned source the row
  * counts can't see — but re-scanning history for its distribution costs
  * a full-corpus pass per day.
  *
  * Fixed-bucket histograms are EXACTLY mergeable (bucket counts add), so
  * the ledger stores one (group, bucket, cnt) row-set per batch under
  * `dir/batch=<id>` and every question answers from counts alone:
  * corpus-to-date histograms ([[merged]]), quantile brackets with error
  * bounded by one bucket width ([[quantiles]]), and a drift score
  * against an incoming batch ([[drift]]) — history is NEVER rescanned,
  * and the ledger read is (groups × buckets) rows × batches, metadata by
  * construction. Unlike the HLL card ledger, everything here is exact
  * integer arithmetic — the whole family is DuckDB-oracle-able
  * (q151–q153), not just tolerance-pinned.
  *
  * Store discipline (all inherited from the card ledger, spec-pinned
  * there and here):
  *  - bucketing geometry (`lo`, `hi`, `nBuckets`) is a FOUNDING constant
  *    persisted in `dir/_params`; an append restating different geometry
  *    fails loudly — histograms on different grids cannot merge;
  *  - overwrite-per-batch-dir keeps at-least-once replay idempotent
  *    (same id + same content → same rows);
  *  - compaction folds all at-or-below-horizon batch dirs into one
  *    summed snapshot via the crash-safe staged swap, and the `_horizon`
  *    marker makes a below-horizon replay fail loudly instead of
  *    silently double-counting.
  *
  * Bucket rule ([[bucketOf]]): underflow → −1, `v >= hi` → nBuckets,
  * else `min(⌊(v−lo)/width⌋, nBuckets−1)` with `width = (hi−lo)/nBuckets`
  * — the `least` guard pins values within an ulp of `hi` to the last
  * real bucket, and the same IEEE expression replays bit-identically in
  * any engine.
  */
object HistLedger {

  /** The bucket index of `v` on the (lo, hi, nBuckets) grid; −1 and
    * nBuckets are the open under/overflow buckets. */
  def bucketOf(v: org.apache.spark.sql.Column, lo: Double, hi: Double,
               nBuckets: Int): org.apache.spark.sql.Column = {
    val width = (hi - lo) / nBuckets
    when(v < lo, lit(-1L))
      .when(v >= hi, lit(nBuckets.toLong))
      .otherwise(least(floor((v - lit(lo)) / lit(width)).cast("long"),
        lit(nBuckets - 1L)))
  }

  /** One batch's histogram: (group, bucket, cnt), null values dropped,
    * group cast to string (the ledger's key type, the card-ledger
    * convention). One narrow groupBy with map-side partials. */
  def sketch(batch: DataFrame, groupCol: String, valCol: String,
             lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    batch.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("group"),
        bucketOf(col(valCol).cast("double"), lo, hi, nBuckets).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketch frames by summing bucket counts — exact, associative,
    * idempotent only per-batch-dir (the overwrite discipline), which is
    * why replay overwrites rather than re-appends. */
  def mergedOf(sketches: Seq[DataFrame]): DataFrame = {
    require(sketches.nonEmpty, "nothing to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(col("group"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Quantile BRACKETS from a merged histogram: per (group, q), the
    * first bucket where the cumulative count reaches ⌈q·total⌉, with its
    * value edges (`q_lo`/`q_hi`; null = the open under/overflow edge).
    * The true quantile is inside the bracket — error ≤ one bucket width,
    * the classic equi-width-histogram bound. The cumulative window is
    * keyed by group and bounded by nBuckets+2 rows — a constant, never
    * corpus-shaped. */
  def quantilesOf(merged: DataFrame, qs: Seq[Double],
                  lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(qs.nonEmpty, "qs must be non-empty")
    require(qs.forall(q => q > 0 && q <= 1), s"quantiles must be in (0,1], got $qs")
    import org.apache.spark.sql.expressions.Window
    val width = (hi - lo) / nBuckets
    val w = Window.partitionBy(col("group")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = merged.groupBy(col("group")).agg(sum(col("cnt")).as("_tot"))
    merged.withColumn("_cum", sum(col("cnt")).over(w))
      .join(tot, Seq("group"))
      .select(col("group"), col("bucket"), col("_cum"), col("_tot"),
        explode(typedLit(qs.distinct.sorted)).as("q"))
      .filter(col("_cum") >= ceil(col("q") * col("_tot")))
      .groupBy(col("group"), col("q"))
      .agg(min(col("bucket")).as("bucket"))
      .select(col("group"), col("q"), col("bucket"),
        when(col("bucket") === -1L, lit(null).cast("double"))
          .when(col("bucket") === nBuckets.toLong, lit(hi))
          .otherwise(lit(lo) + col("bucket") * lit(width)).as("q_lo"),
        when(col("bucket") === -1L, lit(lo))
          .when(col("bucket") === nBuckets.toLong, lit(null).cast("double"))
          .otherwise(lit(lo) + (col("bucket") + 1L) * lit(width)).as("q_hi"))
  }

  /** Total-variation distance between two sketch frames, per group:
    * `TV = ½ Σ_b |a_b/T_A − b_b/T_B|` — 0 for identical distributions,
    * 1 for disjoint support, and defined as 1.0 when a group exists on
    * only one side (a brand-new group IS maximal drift). Computed in
    * EXACT cross-multiplied integers — `Σ|a_b·T_B − b_b·T_A|` as
    * decimal(38,0) sums (counts × totals overflow int64 at corpus
    * scale) — with ONE double division at the end, so the score is
    * deterministic and oracle-able, immune to float summation order. */
  def tvDistance(a: DataFrame, b: DataFrame): DataFrame = {
    val ta = a.groupBy(col("group")).agg(sum(col("cnt")).as("_ta"))
    val tb = b.groupBy(col("group")).agg(sum(col("cnt")).as("_tb"))
    val tot = ta.join(tb, Seq("group"), "full_outer")
    val diffs = a.select(col("group"), col("bucket"), col("cnt").as("_ca"))
      .join(b.select(col("group"), col("bucket"), col("cnt").as("_cb")),
        Seq("group", "bucket"), "full_outer")
      .select(col("group"),
        coalesce(col("_ca"), lit(0L)).cast("decimal(19,0)").as("_ca"),
        coalesce(col("_cb"), lit(0L)).cast("decimal(19,0)").as("_cb"))
    val num = diffs.join(tot, Seq("group"))
      .groupBy(col("group"))
      .agg(sum(abs(col("_ca") * col("_tb").cast("decimal(19,0)")
        - col("_cb") * col("_ta").cast("decimal(19,0)"))).as("_num"))
    tot.join(num, Seq("group"), "left")
      .select(col("group"),
        when(col("_ta").isNull || col("_tb").isNull, lit(1.0))
          .otherwise(col("_num").cast("double")
            / (lit(2.0) * col("_ta").cast("double") * col("_tb").cast("double")))
          .as("tv_dist"))
  }

  // ---- the standing store ----

  private def paramsPath(dir: String) = s"$dir/_params"
  private def horizonPath(dir: String) = s"$dir/_horizon"

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readSmall(spark: SparkSession, path: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim) finally in.close()
    }
  }

  private def writeSmall(spark: SparkSession, path: String, s: String): Unit = {
    val f = fs(spark, path)
    val out = f.create(new org.apache.hadoop.fs.Path(path), true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  /** The founding bucket geometry, or None for a store with no appends
    * yet. Encoded as the exact textual doubles, so a restated geometry
    * compares by VALUE, not by bits-of-formatting. */
  def params(spark: SparkSession, dir: String): Option[(Double, Double, Int)] =
    readSmall(spark, paramsPath(dir)).map { s =>
      val a = s.split("\\s+")
      (a(0).toDouble, a(1).toDouble, a(2).toInt)
    }

  private def horizon(spark: SparkSession, dir: String): Option[Long] =
    readSmall(spark, horizonPath(dir)).map(_.toLong)

  /** True once at least one batch dir exists — the founding test the
    * drift-gated ingest sink uses (a founding batch has no history to
    * drift against and must be admitted, or nothing ever founds). */
  def hasHistory(spark: SparkSession, dir: String): Boolean =
    batchIds(spark, dir).nonEmpty

  private def batchIds(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).toSeq
  }

  /** Append one batch's histogram under `dir/batch=<batchId>` — the
    * card-ledger append contract verbatim: geometry founded on first
    * append and enforced forever after; horizon-batch re-delivery is a
    * no-op; below-horizon replay fails loudly; optional `keepLast`
    * compacts on the way out. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             groupCol: String, valCol: String, batchId: Long,
             lo: Double, hi: Double, nBuckets: Int,
             keepLast: Int = -1): Unit = {
    params(spark, dir) match {
      case Some((plo, phi, pn)) =>
        require(plo == lo && phi == hi && pn == nBuckets,
          s"histogram ledger at $dir was founded with geometry " +
            s"[$plo, $phi)×$pn; an append restating [$lo, $hi)×$nBuckets " +
            "cannot merge — use the founding geometry or a new ledger dir")
      case None =>
        writeSmall(spark, paramsPath(dir), s"$lo $hi $nBuckets")
    }
    val hz = horizon(spark, dir)
    if (hz.contains(batchId)) return
    if (hz.exists(batchId < _))
      throw new IllegalStateException(
        s"batch $batchId is below the ledger's compaction horizon " +
          s"(${hz.get}) — replay only batches at or above the horizon, " +
          "or compact with a wider keepLast")
    val existing = batchIds(spark, dir)
    if (existing.nonEmpty && !existing.contains(batchId) && batchId < existing.min)
      throw new IllegalStateException(
        s"batch $batchId is below the ledger's compaction horizon " +
          s"(oldest surviving dir: batch ${existing.min}) — replay only " +
          "batches at or above the horizon, or compact with a wider keepLast")
    sketch(batch, groupCol, valCol, lo, hi, nBuckets)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=$batchId")
    if (keepLast >= 0) compact(spark, dir, batchId - keepLast)
  }

  /** Corpus-to-date histogram from the ledger alone: one sum per
    * (group, bucket) over per-batch counts — no data rescan. */
  def merged(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("group"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Corpus-to-date quantile brackets from the ledger alone. */
  def quantiles(spark: SparkSession, dir: String, qs: Seq[Double]): DataFrame = {
    val (lo, hi, n) = params(spark, dir).getOrElse(
      throw new IllegalStateException(s"no histogram ledger at $dir"))
    quantilesOf(merged(spark, dir), qs, lo, hi, n)
  }

  /** Drift gate: TV distance of an incoming batch against the corpus to
    * date, per group — ONE batch-sized scan plus a ledger read; the
    * geometry comes from the store, so the batch is bucketed on exactly
    * the grid history was. */
  def drift(spark: SparkSession, dir: String, batch: DataFrame,
            groupCol: String, valCol: String): DataFrame = {
    val (lo, hi, n) = params(spark, dir).getOrElse(
      throw new IllegalStateException(s"no histogram ledger at $dir"))
    tvDistance(merged(spark, dir), sketch(batch, groupCol, valCol, lo, hi, n))
  }

  /** Fold every batch dir at-or-below `upTo` into one summed snapshot
    * under the newest folded id — the card-ledger compaction verbatim
    * (staged swap, self-repair of crashed staging, horizon marker before
    * the destructive phase; every window holds a superset of the counts
    * and per-dir content is never partially deleted). Counts sum
    * exactly, so estimates are invariant across the fold. */
  def compact(spark: SparkSession, dir: String, upTo: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(root)) return
    def path(name: String) = new org.apache.hadoop.fs.Path(s"$dir/$name")
    val old = f.globStatus(path("_compact_old_*"))
    if (old != null) old.foreach { s =>
      val survivor = path("batch=" + s.getPath.getName.stripPrefix("_compact_old_"))
      if (!f.exists(survivor)) f.rename(s.getPath, survivor)
      else f.delete(s.getPath, true)
    }
    if (f.exists(path("_compact_tmp"))) f.delete(path("_compact_tmp"), true)

    val ids = batchIds(spark, dir)
    val folded = ids.filter(_ <= upTo)
    if (folded.size <= 1) return
    val survivor = folded.max
    // merge on the driver first (groups × buckets — metadata), so no
    // destructive op happens before the fold is fully materialized
    val mergedRows = spark.read.parquet(folded.map(id => s"$dir/batch=$id"): _*)
      .groupBy(col("group"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
      .collect().toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("group",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(mergedRows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_compact_tmp")
    writeSmall(spark, horizonPath(dir), survivor.toString)
    f.rename(path(s"batch=$survivor"), path(s"_compact_old_$survivor"))
    f.rename(path("_compact_tmp"), path(s"batch=$survivor"))
    f.delete(path(s"_compact_old_$survivor"), true)
    folded.filter(_ < survivor).foreach(id => f.delete(path(s"batch=$id"), true))
  }
}
