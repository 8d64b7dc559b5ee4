package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream — the batch formulation
  * (lag + running sum of session breaks), partitioned by user: shuffles
  * once on the user key, then window functions run within partitions.
  * The streaming formulation lives in graft.streaming (mapGroupsWithState).
  */
object Sessionize {

  /** Assign 1-based session ids per user; a session breaks when the gap
    * from the previous event exceeds `gapSeconds`. */
  def withSessionId(df: DataFrame, userCol: String, tsCol: String, tieCol: String,
                    gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    val gap = unix_timestamp(col(tsCol)) - unix_timestamp(lag(col(tsCol), 1).over(byUser))
    val isBreak = when(gap.isNull || gap > gapSeconds, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isBreak).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session rollup: event count, value sum, first/last timestamps. */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String, tieCol: String,
                   valueCol: String, gapSeconds: Long): DataFrame =
    withSessionId(df, userCol, tsCol, tieCol, gapSeconds)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("sum_value"),
        date_format(min(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        date_format(max(col(tsCol)), "yyyy-MM-dd HH:mm:ss").as("session_end"))
}
