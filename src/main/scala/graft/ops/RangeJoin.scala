package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch range join: attach each point row to every interval (same key)
  * that CONTAINS it — `point ∈ [start, end]`. The batch sibling of
  * [[AsofJoin]] (latest-before) and the streaming interval join.
  *
  * Spark's built-in planning for a join whose ON clause is an equi-key
  * plus a BETWEEN turns the range predicate into a post-join filter: fine
  * when the equi-key is selective, catastrophic when many rows share a key
  * (the per-key cross product materializes first). The standard scale fix
  * is BINNING: chop the value axis into fixed-width bins, explode each
  * interval to the bins it overlaps, tag each point with its single bin,
  * and equi-join on (key, bin) before the exact containment filter.
  *
  *  - The join is a plain hash equi-join on narrow keys — shuffles
  *    partition cleanly, AQE/skew handling applies, no nested loop.
  *  - A point's bin is unique, so an (interval, point) pair meets in
  *    exactly one bin — no post-join dedup.
  *  - Interval explosion is `(len / binWidth) + 1` rows per interval;
  *    pick `binWidth` near the typical interval length so that stays O(1)
  *    (the classic occupancy trade — same rule as LSH plane sizing).
  */
object RangeJoin {

  /** Join `points` to containing `intervals` rows. `pointCol`, `startCol`,
    * `endCol` must be numeric (cast timestamps to epoch first); `keyCols`
    * are the equi-keys present on both sides. Intervals with `end < start`
    * (or a null bound) match nothing. Output carries all columns of both
    * inputs (intervals' key columns dropped). */
  def binnedRangeJoin(points: DataFrame, intervals: DataFrame,
                      keyCols: Seq[String], pointCol: String,
                      startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val iv = intervals.filter(col(startCol) <= col(endCol))
      .withColumn("_bin",
        explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    val pt = points.withColumn("_bin", bin(col(pointCol)))
    pt.join(iv, Seq("_bin") ++ keyCols)
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("_bin")
  }
}
