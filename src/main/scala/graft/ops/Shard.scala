package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Size-balanced shard assignment — the last step of a training-data
  * pipeline: the curated corpus must be written as N shards whose token
  * totals are near-equal, or data-parallel training ranks idle on the
  * small shards while the big one streams (and a skewed shard skews the
  * within-epoch example distribution).
  *
  * Strategy: serpentine (boustrophedon) round-robin over the size-DESC
  * rank — rank 1..n fill shards 0..n-1, ranks n+1..2n fill them BACK in
  * reverse, and so on. Each full serpentine cycle gives every shard
  * exactly one document from each "size band", and the reversal pairs a
  * band's largest remainder with the next band's smallest — the classic
  * deterministic approximation of longest-processing-time scheduling
  * that needs NO sequential state (unlike greedy least-loaded-bin, which
  * is inherently one-at-a-time and cannot be expressed as a parallel
  * plan). Imbalance after a cycle is bounded by the within-band size
  * spread, so shard totals converge as documents/shard grows — exactly
  * the 100-TB regime (millions of documents per shard).
  *
  * Scale shape: the only global structure is the size-DESC dense rank,
  * which [[IdAssign.withDenseId]] provides via range partition +
  * per-partition positions + broadcast offsets — NO single-partition
  * window, no sequential pass. The shard number is then row-local
  * arithmetic on the rank. Writing the shards afterwards is
  * `repartition(n, col(shardCol))` + a partitioned write — one hash
  * shuffle on a small int key.
  *
  * The rule is pure arithmetic over a deterministic rank, so any engine
  * can replay it — the DuckDB oracle recomputes the same assignment from
  * `row_number() OVER (ORDER BY size DESC, id)`.
  */
object Shard {

  /** Adds `shardCol` (0-based int) assigning each row to one of
    * `nShards` size-balanced shards. `sizeCol` is the balance weight
    * (token count, byte length); `idCol` breaks size ties so the
    * assignment is total-order deterministic. */
  def balancedAssign(df: DataFrame, idCol: String, sizeCol: String,
                     nShards: Int, shardCol: String = "shard",
                     scope: CacheScope = CacheScope.noop): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val ranked = IdAssign.withDenseId(df, "_srank", 0L, scope,
      col(sizeCol).desc, col(idCol).asc)
    ranked.withColumn(shardCol, serpentine(col("_srank") - 1, nShards))
      .drop("_srank")
  }

  /** Serpentine position→shard: pos runs 0,1,2,…; within each cycle of
    * 2n the first n go forward (0..n-1), the second n backward
    * (n-1..0). */
  private[ops] def serpentine(pos: Column, n: Int): Column = {
    val cyc = pos % (2L * n)
    when(cyc < n, cyc).otherwise(lit(2L * n - 1) - cyc).cast("int")
  }

  /** Per-shard balance report: row count, total/min/max weight per
    * shard — the number a pipeline asserts on before shipping shards to
    * trainers (max/min total near 1 = balanced). One narrow shuffle on
    * the shard key. */
  def shardStats(assigned: DataFrame, sizeCol: String,
                 shardCol: String = "shard"): DataFrame =
    assigned.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).as("total_size"),
        min(col(sizeCol)).as("min_size"),
        max(col(sizeCol)).as("max_size"))

  /** Release manifest: per shard, the document count, the total token
    * mass, and an ORDER-INVARIANT additive content hash — the artifact a
    * release ships next to its shards so a rebuild (or a consumer) can
    * prove byte-level content identity without re-reading the corpus.
    * Two builds of the same release compare manifests; a mismatch names
    * the exact shard to diff. The hash is the sum of a 32-bit md5 prefix
    * of `id|content` per document: insensitive to row order and
    * partitioning (sum is commutative — Spark's nondeterministic row
    * order inside a shard cannot move it), sensitive to any content,
    * id, membership or assignment change. md5-derived, so any engine
    * reproduces it (the repo's RNG-free constant discipline).
    *
    * Row-local hash projection + one narrow groupBy on the shard key —
    * the text never shuffles (each doc contributes one long). The
    * 32-bit-per-doc sum stays exact in a BIGINT below ~2³¹ docs PER
    * SHARD; shards at that size are mis-sized for training anyway.
    * Returns (shardCol, n_docs, n_tokens, content_hash). */
  def manifest(assigned: DataFrame, idCol: String, textCol: String,
               sizeCol: String, shardCol: String = "shard"): DataFrame =
    assigned.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).cast("long").as("n_tokens"),
        sum(conv(substring(md5(concat(col(idCol).cast("string"), lit("|"),
          col(textCol))), 1, 8), 16, 10).cast("long")).as("content_hash"))

  /** Manifest diff — the consumer side of [[manifest]]: given the
    * current and a prior manifest, name exactly which shards changed
    * and how. `status` ∈ added / removed / changed / equal; changed
    * rows carry the per-field deltas (docs, tokens) and a hash-only
    * flag (same counts, different content — the silent-edit signature
    * worth the loudest alarm). A release gate reads this table instead
    * of re-reading either corpus: two full-outer-joined
    * manifest-sized frames, O(shards) work total.
    *
    * Returns (shardCol, status, n_docs, n_tokens, content_hash,
    * prior_n_docs, prior_n_tokens, prior_content_hash,
    * d_docs, d_tokens, hash_only_change). */
  def manifestDiff(current: DataFrame, prior: DataFrame,
                   shardCol: String = "shard"): DataFrame = {
    val c = current.select(col(shardCol).as("_s"), col("n_docs").as("n_docs"),
      col("n_tokens").as("n_tokens"), col("content_hash").as("content_hash"))
    val p = prior.select(col(shardCol).as("_s"), col("n_docs").as("prior_n_docs"),
      col("n_tokens").as("prior_n_tokens"),
      col("content_hash").as("prior_content_hash"))
    c.join(p, Seq("_s"), "full_outer")
      .withColumn("status",
        when(col("prior_n_docs").isNull, lit("added"))
          .when(col("n_docs").isNull, lit("removed"))
          .when(col("n_docs") === col("prior_n_docs") &&
            col("n_tokens") === col("prior_n_tokens") &&
            col("content_hash") === col("prior_content_hash"), lit("equal"))
          .otherwise(lit("changed")))
      .withColumn("d_docs", col("n_docs") - col("prior_n_docs"))
      .withColumn("d_tokens", col("n_tokens") - col("prior_n_tokens"))
      .withColumn("hash_only_change",
        col("status") === "changed" &&
          col("d_docs") === 0 && col("d_tokens") === 0)
      .select(col("_s").as(shardCol), col("status"),
        col("n_docs"), col("n_tokens"), col("content_hash"),
        col("prior_n_docs"), col("prior_n_tokens"), col("prior_content_hash"),
        col("d_docs"), col("d_tokens"), col("hash_only_change"))
  }

  /** Writes `assigned` as one directory per shard
    * (`…/shard=<k>/part-*.parquet`) — `nShards` output tasks, each
    * writing exactly its shard, via ONE hash shuffle on the shard key.
    * The directory layout is Hive-partitioned, so downstream readers
    * get shard pruning for free. */
  def writeShards(assigned: DataFrame, path: String, nShards: Int,
                  shardCol: String = "shard"): Unit =
    assigned.repartition(nShards, col(shardCol))
      .write.mode("overwrite").partitionBy(shardCol).parquet(path)
}
