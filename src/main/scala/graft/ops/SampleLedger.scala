package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Standing inspection-sample ledger: a deterministic uniform sample of
  * `k` rows per group over the corpus TO DATE, maintained incrementally —
  * the third leg of the ledger family ([[Corpus.cardLedgerAppend]]
  * counts distincts, [[HistLedger]] keeps distributions; this keeps the
  * rows a human actually looks at). Every data incident ends with
  * "show me 20 random documents from that source" — answering it with a
  * corpus scan at 100 TB costs a full pass exactly when the team is
  * firefighting; the ledger answers from kilobytes.
  *
  * The sample is bottom-k by a salted hash: rank = md5(seed|id), keep
  * the k smallest per group — a uniform without-replacement draw (ids
  * hash uniformly) that is DETERMINISTIC and, crucially, MERGEABLE:
  * bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪ bottom-k(B)), so each batch
  * dir stores only the batch's own per-group bottom-k and reads re-rank
  * the union of survivors (≤ dirs × groups × k rows — metadata). Like
  * the HLL ledger — and unlike the histogram one — the fold is
  * content-idempotent: re-delivered content re-proposes the same
  * (hash, id) candidates and the bottom-k cannot change, so even a
  * double-append under two batch ids leaves the sample bit-identical.
  *
  * Store discipline (the card/histogram contract): `k` and `seed` are
  * FOUNDING constants in `_params` (k=10 survivors cannot answer a k=20
  * read; a different seed is a different permutation — neither merges),
  * overwrite-per-batch-dir replay idempotence, `_horizon` guard, and
  * the staged-swap [[compact]] folding at-or-below-horizon dirs into one
  * snapshot of ≤ groups × k rows.
  *
  * Ledger schema: (group string, id string, payload string) — the id
  * re-derives the rank (md5 is recomputable), the payload is whatever
  * single column the curator wants to SEE (text head, url, source).
  * Fully oracle-able: the salted-hash draw is the groupCap/q111
  * convention any engine replays.
  *
  * Scale shape: [[sketch]] rides [[TextAnalysis.groupCap]] — one shuffle
  * on the group key with the partial per-group top-k pushed BELOW the
  * exchange (`WindowGroupLimit`, k ≤ the 1000-row limit threshold), so a
  * skewed group never funnels through one task; everything after the
  * sketch is survivor-sized. */
object SampleLedger {

  /** One batch's contribution: the batch's own per-group bottom-k —
    * (group, id, payload), all strings (the ledger's uniform schema). */
  def sketch(batch: DataFrame, groupCol: String, idCol: String,
             payloadCol: String, k: Int,
             seed: String = "graft-sample"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    TextAnalysis.groupCap(
        batch.select(col(groupCol).cast("string").as("group"),
          col(idCol).cast("string").as("id"),
          col(payloadCol).cast("string").as("payload")),
        "group", "id", k, seed)
      .select(col("group"), col("id"), col("payload"))
  }

  /** Merge sketch frames: re-rank the union of survivors and keep the
    * global per-group bottom-k — exact by the bottom-k merge property.
    * Returns (group, id, payload, cap_rank). The input is survivor-sized
    * (≤ frames × groups × k rows), so the re-rank window is metadata. */
  def mergedOf(sketches: Seq[DataFrame], k: Int,
               seed: String = "graft-sample"): DataFrame = {
    require(sketches.nonEmpty, "nothing to merge")
    TextAnalysis.groupCap(
      sketches.reduce(_ unionByName _).distinct(), "group", "id", k, seed)
  }

  // ---- the standing store ----

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

  /** The ledger's founding constants. `k` and `seed` shape the draw
    * itself; the three COLUMN choices are founding too — a ledger whose
    * batch 0 sampled (lang, doc_id, source) and batch 1 (source, doc_id,
    * text) would still merge arithmetically but mean nothing. One
    * constant per line (seeds may contain spaces). */
  final case class SampleParams(k: Int, seed: String, groupCol: String,
                                idCol: String, payloadCol: String)

  /** The founding constants, or None before the first append. */
  def params(spark: SparkSession, dir: String): Option[SampleParams] =
    readSmall(spark, s"$dir/_params").map { s =>
      val l = s.split("\n").map(_.trim)
      SampleParams(l(0).toInt, l(1), l(2), l(3), l(4))
    }

  private def horizon(spark: SparkSession, dir: String): Option[Long] =
    readSmall(spark, s"$dir/_horizon").map(_.toLong)

  private def batchIds(spark: SparkSession, dir: String): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = fs(spark, dir)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).iterator.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .map(_.stripPrefix("batch=").toLong).toSeq
  }

  /** Append one batch's bottom-k under `dir/batch=<batchId>` — founding
    * (k, seed) enforced forever after; horizon-batch re-delivery no-ops;
    * below-horizon replay fails loudly; `keepLast` compacts on the way
    * out. */
  def append(spark: SparkSession, dir: String, batch: DataFrame,
             groupCol: String, idCol: String, payloadCol: String,
             batchId: Long, k: Int, seed: String = "graft-sample",
             keepLast: Int = -1): Unit = {
    params(spark, dir) match {
      case Some(p) =>
        require(p == SampleParams(k, seed, groupCol, idCol, payloadCol),
          s"sample ledger at $dir was founded with $p; an append " +
            s"restating ${SampleParams(k, seed, groupCol, idCol, payloadCol)} " +
            "cannot merge — use the founding constants or a new ledger dir")
      case None =>
        writeSmall(spark, s"$dir/_params",
          s"$k\n$seed\n$groupCol\n$idCol\n$payloadCol")
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
    sketch(batch, groupCol, idCol, payloadCol, k, seed)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=$batchId")
    if (keepLast >= 0) compact(spark, dir, batchId - keepLast)
  }

  /** The corpus-to-date sample from the ledger alone: re-rank survivors,
    * keep the global per-group bottom-k — no data rescan. Returns
    * (group, id, payload, cap_rank). */
  def merged(spark: SparkSession, dir: String): DataFrame = {
    val p = params(spark, dir).getOrElse(
      throw new IllegalStateException(s"no sample ledger at $dir"))
    mergedOf(Seq(spark.read.parquet(dir).select("group", "id", "payload")),
      p.k, p.seed)
  }

  /** Fold at-or-below-horizon dirs into one bottom-k snapshot (staged
    * swap, self-repairing, horizon marker before the destructive phase —
    * the card/histogram compaction verbatim). The fold is exact by the
    * bottom-k merge property and idempotent on content. */
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
    val prm = params(spark, dir).getOrElse(
      throw new IllegalStateException(s"no sample ledger at $dir"))
    // fold on the driver first (≤ groups × k rows — metadata), so no
    // destructive op happens before the snapshot is fully materialized
    val rows = mergedOf(Seq(
        spark.read.parquet(folded.map(id => s"$dir/batch=$id"): _*)
          .select("group", "id", "payload")), prm.k, prm.seed)
      .select("group", "id", "payload")
      .collect().toSeq
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("group",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/_compact_tmp")
    writeSmall(spark, s"$dir/_horizon", survivor.toString)
    f.rename(path(s"batch=$survivor"), path(s"_compact_old_$survivor"))
    f.rename(path("_compact_tmp"), path(s"batch=$survivor"))
    f.delete(path(s"_compact_old_$survivor"), true)
    folded.filter(_ < survivor).foreach(id => f.delete(path(s"batch=$id"), true))
  }
}
