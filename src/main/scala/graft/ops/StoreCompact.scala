package graft.ops

import org.apache.spark.sql.SparkSession

/** Small-file compaction and crash-safe replacement for append-only
  * standing-index stores.
  *
  * Every standing index here grows by `mode("append")` parquet deltas —
  * one file group per ingest batch ([[Dedup.appendNearDupIndex]],
  * [[Similarity.appendEmbedIndex]], [[Similarity.appendIvfPqIndex]]).
  * That is the right WRITE shape (history is never rewritten), but a
  * year of daily appends leaves ~365 file groups per store: every
  * probe's scan pays the listing and per-file open cost, and files
  * shrink toward the batch size instead of the scan-optimal ~128 MB.
  * This is the offset/card-ledger dir-creep hazard
  * ([[graft.streaming.EventStream]] PackOffsetStore.compact,
  * [[Corpus.cardLedgerCompact]]) at the data layer.
  *
  * [[compactParquetDir]] rewrites one flat parquet dir into
  * size-targeted files (total bytes / 128 MB — no parallelism floor:
  * parquet is row-group-splittable, so even one large file scans in
  * parallel, and fewer files is the whole point). Run it OFFLINE on a
  * maintenance cadence — weekly, or when file count exceeds a few ×
  * the target — never inside the ingest loop.
  *
  * Crash safety (the cardLedgerCompact swap, exposed as [[stagedSwap]]
  * so whole-store replacement — [[Similarity.refoundIvfPqIndex]] — rides
  * the same discipline): the replacement lands in an
  * underscore-invisible staging dir first, then swaps in via two
  * renames with the original kept aside until the staged copy is in
  * place; a stale aside dir (death mid-swap) is restored or dropped on
  * the next call. Readers between the renames see a missing dir for
  * the duration of one filesystem metadata op; on a store with atomic
  * rename (HDFS, local) a concurrent probe either sees the old or the
  * new files, both complete. */
private[ops] object StoreCompact {

  private def layout(spark: SparkSession, dir: String) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, root,
      new org.apache.hadoop.fs.Path(root.getParent, "_compact_old_" + root.getName),
      new org.apache.hadoop.fs.Path(root.getParent, "_compact_tmp_" + root.getName))
  }

  /** Self-repair a crashed previous [[stagedSwap]]: an aside dir without
    * the live dir means death between the two renames — restore it;
    * otherwise the aside/tmp are stale copies — drop them. Idempotent;
    * callers that must READ the store before swapping it (refound reads
    * the params table) run this first. */
  def repairSwap(spark: SparkSession, dir: String): Unit = {
    val (fs, root, aside, tmp) = layout(spark, dir)
    if (fs.exists(aside)) {
      if (!fs.exists(root)) fs.rename(aside, root) else fs.delete(aside, true)
    }
    if (fs.exists(tmp)) fs.delete(tmp, true)
  }

  /** Crash-safe staged replacement of `dir`: repair any interrupted
    * previous swap, have `writeTo` materialize the replacement into the
    * staging dir, swap via two renames, and invalidate cached plans over
    * the path (a `loadX().cache()` from earlier in the session would
    * otherwise silently serve the PRE-swap files). Returns false — and
    * writes nothing — if `dir` is absent after repair. */
  def stagedSwap(spark: SparkSession, dir: String)(writeTo: String => Unit): Boolean = {
    val (fs, root, aside, tmp) = layout(spark, dir)
    repairSwap(spark, dir)
    if (!fs.exists(root)) return false
    writeTo(tmp.toString)
    fs.rename(root, aside)
    fs.rename(tmp, root)
    fs.delete(aside, true)
    spark.catalog.refreshByPath(dir)
    true
  }

  /** Rewrite the parquet dir at `dir` into ~128 MB files. No-op if the
    * dir is absent. `minus` (ids frame `_tid`, store id column)
    * physically drops tombstoned rows during the rewrite — the
    * [[Tombstones]] apply point: the anti-join rides the compaction scan
    * the store was paying for anyway, so deletion never costs its own
    * history pass. */
  def compactParquetDir(spark: SparkSession, dir: String,
                        minus: Option[(org.apache.spark.sql.DataFrame, String)] = None): Unit = {
    stagedSwap(spark, dir) { tmpDir =>
      val (fs, root, _, _) = layout(spark, dir)
      val bytes = fs.getContentSummary(root).getLength
      val target = math.min(bytes / (128L << 20) + 1, 1000000L).toInt
      val live = minus.foldLeft(spark.read.parquet(dir)) { case (df, (tombs, idCol)) =>
        df.join(org.apache.spark.sql.functions.broadcast(tombs),
          df(idCol) === tombs("_tid"), "left_anti")
      }
      live.repartition(target)
        .write.mode("overwrite").parquet(tmpDir)
    }
    ()
  }
}
