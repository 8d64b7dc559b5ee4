package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deletion support for the standing-index stores — the
  * right-to-be-forgotten half of the append-only discipline.
  *
  * Every standing store here ([[Dedup.saveNearDupIndex]] shingles+bands,
  * [[Similarity.saveEmbedIndex]] buckets, [[Similarity.saveIvfPqIndex]]
  * coded) grows by `mode("append")` parquet deltas and NEVER rewrites
  * history — which is exactly why a deletion cannot be an in-place edit.
  * The production pattern (Iceberg delete files, Lucene live-docs) is a
  * TOMBSTONE sidecar: removals append an id list under
  * `store/_tombstones/`; reads subtract it; the next offline compaction
  * applies it physically and clears it. The underscore prefix matters:
  * Spark/Hadoop listings hide `_`-prefixed children, so the sidecar can
  * live INSIDE a flat parquet store (the fingerprint snapshot dir the
  * CurateCli `dedup` loop appends) without plain
  * `spark.read.parquet(storeDir)` readers ever seeing it — the
  * `_delta_log` convention. Deletes stay O(deleted ids) at
  * write time no matter how large the history is, and the read-side cost
  * is one anti-join against a table that compaction keeps near-empty.
  *
  * Read-side shape: the tombstone side is BROADCAST — the daily deletion
  * workload is batch-sized while the store is corpus-sized, so shipping
  * tombstones to the store's partitions (never shuffling the store) is
  * the only shape that survives 100 TB. A mass deletion that outgrows a
  * broadcast should run [[applyNow]]-style compaction first instead of
  * probing through it.
  *
  * Re-add hazard: a pending tombstone would silently swallow a LATER
  * re-ingest of the same id (load subtracts by id, not by batch). The
  * append paths therefore call [[requireNotTombstoned]] and fail loudly
  * — the [[graft.streaming.EventStream]] PackOffsetStore horizon
  * discipline: an id re-enters only after compaction has applied and
  * cleared its tombstone. */
private[ops] object Tombstones {

  def dir(storePath: String): String = s"$storePath/_tombstones"

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Record deletions: append the distinct ids (one column, renamed
    * `_tid`) under `store/_tombstones`. O(ids) — history untouched. */
  def append(spark: SparkSession, storePath: String,
             ids: DataFrame, idCol: String): Unit =
    ids.select(col(idCol).as("_tid")).distinct()
      .write.mode("append").parquet(dir(storePath))

  /** The pending tombstones, if any. */
  def readOpt(spark: SparkSession, storePath: String): Option[DataFrame] = {
    val (fs, p) = fsOf(spark, dir(storePath))
    if (fs.exists(p)) Some(spark.read.parquet(dir(storePath))) else None
  }

  /** Subtract pending tombstones from a store table: broadcast
    * anti-join on `idCol`; identity when none are pending. Idempotent —
    * re-applying to already-filtered data is a no-op, which is what
    * makes the compaction swap crash-safe without coordination. */
  def applyTo(spark: SparkSession, storePath: String,
              df: DataFrame, idCol: String): DataFrame =
    readOpt(spark, storePath) match {
      case None        => df
      case Some(tombs) =>
        df.join(broadcast(tombs), df(idCol) === tombs("_tid"), "left_anti")
    }

  /** Fail loudly if any of a batch's ids has a PENDING tombstone — the
    * re-add guard (one broadcast-join count over the batch, never the
    * store). */
  def requireNotTombstoned(spark: SparkSession, storePath: String,
                           ids: DataFrame, idCol: String): Unit =
    readOpt(spark, storePath).foreach { tombs =>
      val clash = ids.select(col(idCol).as("_aid"))
        .join(broadcast(tombs), col("_aid") === col("_tid"), "left_semi")
        .limit(1).collect()
      require(clash.isEmpty,
        s"batch id '${clash.head.get(0)}' has a pending tombstone in " +
          s"${dir(storePath)} — compact the store (applies and clears " +
          "tombstones) before re-adding a deleted id")
    }

  /** Drop the tombstone dir (compaction has applied it physically). */
  def clear(spark: SparkSession, storePath: String): Unit = {
    val (fs, p) = fsOf(spark, dir(storePath))
    if (fs.exists(p)) fs.delete(p, true)
  }
}
