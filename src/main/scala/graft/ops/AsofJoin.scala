package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single right row with the
  * greatest `rightTime <= leftTime` for the same key (the time-series
  * "most recent fact at or before the event" join; left rows with no such
  * right row keep nulls).
  *
  * Spark has no native as-of join. The naive formulations both fail at
  * scale: a range-condition join (`l.key = r.key AND r.t <= l.t`) explodes
  * to one row per (event, EVERY earlier fact) before a per-event argmax
  * prunes it — quadratic per key; and a broadcast of the right side only
  * works for small fact tables. This implementation is the merge-sorted
  * union pattern:
  *
  *   1. tag and union both sides (cheap, no join);
  *   2. one hash shuffle on the key, sort within key by (time, side-tag);
  *   3. `last_value(right payload, ignoreNulls) OVER (key ORDER BY time,
  *      tag ROWS UNBOUNDED PRECEDING)` — a running "latest fact so far"
  *      carried forward in one pass;
  *   4. keep the left rows.
  *
  * Cost: ONE shuffle of left+right (same as any equi-join on the key), no
  * row explosion, no broadcast-size limit. Right-side duplicates at the
  * same (key, time) must be pre-deduped by the caller if "the" as-of row
  * matters (ties otherwise resolve to the last in (time, input) order —
  * callers wanting determinism aggregate or dedupe first).
  */
object AsofJoin {

  /** @param left      event side (kept in full)
    * @param right     fact side (one row carried forward per key)
    * @param leftKey   join key column in `left`
    * @param rightKey  join key column in `right`
    * @param leftTime  event-time column in `left`
    * @param rightTime fact-time column in `right` (same comparable type)
    * @param payload   right-side columns to attach (must not collide with
    *                  left column names)
    */
  def asof(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side tag orders a fact BEFORE an event at the same timestamp, so an
    // equal-time fact is visible to the event (ASOF t_right <= t_left)
    val l = left.select(
      col(leftKey).as("_ak") +: col(leftTime).as("_at") +: lit(1).as("_aside") +:
        (leftCols.map(col) ++ payload.map(p => lit(null).cast(right.schema(p).dataType).as(p))): _*)
    val r = right.select(
      col(rightKey).as("_ak") +: col(rightTime).as("_at") +: lit(0).as("_aside") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++ payload.map(col)): _*)

    val w = Window.partitionBy(col("_ak"))
      .orderBy(col("_at"), col("_aside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r).select(
      (Seq(col("_ak"), col("_at"), col("_aside")) ++
        leftCols.map(col) ++
        payload.map(p => last(col(p), ignoreNulls = true).over(w).as(p))): _*)

    carried.filter(col("_aside") === 1).drop("_ak", "_at", "_aside")
  }
}
