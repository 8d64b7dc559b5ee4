package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-based row filters: flag or drop rows whose metric is an
  * outlier within its group — the numeric cousin of the text quality
  * gates in [[TextAnalysis]] (drop anomalous event values, absurd
  * document lengths, corrupt sensor readings before they skew training).
  */
object Stats {

  /** Tukey-fence outliers per group: rows whose `valCol` falls outside
    * `[p25 − k·IQR, p75 + k·IQR]` of their `groupCol` group (k = 1.5 is
    * Tukey's classic fence).
    *
    * Quartiles are EXACT (`percentile`, linear interpolation — the q43
    * cross-engine semantics) so the fences are bit-identical across
    * engines: both engines sort the group, pick the same two neighbors,
    * and run the same IEEE interpolation/fence arithmetic. Exact
    * per-group percentiles sort each group's values; at 100 TB swap in
    * `approx_percentile` (bounded-memory KLL sketch, same plan shape) —
    * fences move by the sketch error but the operator is otherwise
    * unchanged.
    *
    * Plan shape: one groupBy over the narrow (group, value) projection
    * producing a tiny per-group fence table (rows = groups), broadcast
    * back onto the fact scan — the data never shuffles, only the
    * fences do. */
  def iqrOutliers(df: DataFrame, groupCol: String, valCol: String,
                  k: Double = 1.5): DataFrame = {
    val fences = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valCol, 0.25)").as("_p25"),
           expr(s"percentile($valCol, 0.75)").as("_p75"))
      .select(col(groupCol),
        (col("_p25") - lit(k) * (col("_p75") - col("_p25"))).as("_lo"),
        (col("_p75") + lit(k) * (col("_p75") - col("_p25"))).as("_hi"))
    df.join(broadcast(fences), Seq(groupCol))
      .filter(col(valCol) < col("_lo") || col(valCol) > col("_hi"))
      .drop("_lo", "_hi")
  }
}
