package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ZOrderExprs

/** Physical data-layout operators: how a 100 TB table should be ARRANGED
  * on disk so later scans prune, not how a query computes. The write-side
  * twin of predicate pushdown — stats-based file skipping only works if
  * the writer clustered rows so per-file min/max ranges are narrow.
  */
object Layout {

  /** Z-order (Morton) clustering key over two dimension columns, each
    * bucketed to `bits` bits via modulo. See
    * [[graft.functions.InterleaveBits]] for why this beats a
    * lexicographic sort for two-column pruning. */
  def zorderKey(x: Column, y: Column, bits: Int): Column =
    ZOrderExprs.interleaveBits(pmod(x.cast("long"), lit(1L << bits)),
      pmod(y.cast("long"), lit(1L << bits)), bits)

  /** Cluster `df` for writing: range-partition by the Morton key of
    * (`xCol`, `yCol`) — contiguous key ranges per output file, sampled
    * boundaries, no hash scatter — then sort within each partition so
    * row-group stats are tight too. `partitions` sizes the output files
    * (at cluster scale: total bytes / target file size). The result
    * streams straight to `write.parquet` — no extra shuffle. */
  def zorderLayout(df: DataFrame, xCol: String, yCol: String, bits: Int,
                   partitions: Int): DataFrame = {
    require(partitions >= 1, "partitions must be positive")
    val keyed = df.withColumn("_z", zorderKey(col(xCol), col(yCol), bits))
    keyed.repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
