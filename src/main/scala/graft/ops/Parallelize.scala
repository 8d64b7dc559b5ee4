package graft.ops

import org.apache.spark.sql.DataFrame

/** Fan-out guard for CPU-heavy per-row stages (regex normalization,
  * shingling, embedding math).
  *
  * Spark sizes scan partitions by BYTES (`spark.sql.files.maxPartitionBytes`),
  * so a compact columnar file with expensive per-row work downstream can come
  * out as ONE task and single-thread the whole stage — 32 idle cores. At
  * cluster scale inputs carry thousands of splits and this is a no-op; it
  * only round-robins rows when the scan's parallelism is below the session's.
  * The check reads the physical plan's partition count (no job is run).
  */
object Parallelize {

  /** Repartition `df` to the default parallelism iff it currently has fewer
    * partitions than that. Row order is NOT preserved across the shuffle —
    * callers that depend on row order must carry an explicit ordering key. */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions < target) df.repartition(target)
    else df
  }

  /** Like `ensure`, but when the input really is under-split, ALSO cache the
    * repartitioned rows (tracked in `scope`).
    *
    * The repartition alone is not enough: Catalyst pushes deterministic
    * filters back down THROUGH a repartition, so a CPU-heavy predicate (the
    * carrot date-normalization regexes) lands in the scan stage — which for
    * a compact single-split file is ONE task, and the whole filter runs
    * serially no matter how wide the shuffle above it is. A cached relation
    * is an optimizer barrier: downstream filters become InMemoryTableScan
    * predicates evaluated on the repartitioned (parallel) partitions.
    *
    * A SPLITTABLE input that is under-split is small (< parallelism ×
    * maxPartitionBytes), so the cache is bounded; at cluster scale inputs
    * carry thousands of splits, this is a no-op, and nothing is cached —
    * filters then push to the scan, which is exactly right when the scan
    * itself is parallel. A NON-splittable source (one gzip CSV) is one
    * partition at any size, so 'under-split ⇒ small' fails there: when the
    * optimizer's size estimate is KNOWN to exceed the splittable budget,
    * the rows still repartition (spreading the downstream work) but stream
    * through uncached instead of spilling the block store (round-3 advice).
    * An UNKNOWN estimate (the Long.MaxValue defaultSizeInBytes sentinel —
    * e.g. a JDBC relation) keeps the cache: those sources are the ones
    * whose `_row_idx` snapshot the cache pins, and a JDBC read the engine
    * chose not to partition is small by construction. */
  def ensureMaterialized(df: DataFrame, scope: CacheScope): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else {
      val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
      val budget = BigInt(target.toLong) * maxPart
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      val knownLarge = est > budget && est < BigInt(Long.MaxValue)
      if (knownLarge) df.repartition(target)
      else scope.track(df.repartition(target).cache())
    }
  }
}
