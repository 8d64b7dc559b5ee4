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
  *
  * Row integrity: the payload is carried as ONE struct (the whole winning
  * fact row), not per-column — a fact with null in some payload column
  * attaches as-is instead of mixing columns from different fact rows
  * (round-3 advice: per-column last(ignoreNulls) built 'chimera' rows for
  * nullable payloads). Facts with a null `rightTime` have no position on
  * the as-of axis and are excluded, as in a native ASOF join.
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
    // one struct = one whole fact row; null struct on the event side, so
    // last(ignoreNulls) picks the latest FACT ROW, never a column mix
    val payStruct = org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))
    // side tag orders a fact BEFORE an event at the same timestamp, so an
    // equal-time fact is visible to the event (ASOF t_right <= t_left)
    val l = left.select(
      col(leftKey).as("_ak") +: col(leftTime).as("_at") +: lit(1).as("_aside") +:
        (leftCols.map(col) :+ lit(null).cast(payStruct).as("_apay")): _*)
    val r = right.filter(col(rightTime).isNotNull).select(
      col(rightKey).as("_ak") +: col(rightTime).as("_at") +: lit(0).as("_aside") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payload.map(col): _*).as("_apay")): _*)

    val w = Window.partitionBy(col("_ak"))
      .orderBy(col("_at"), col("_aside"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r).select(
      (Seq(col("_aside")) ++ leftCols.map(col) :+
        last(col("_apay"), ignoreNulls = true).over(w).as("_apay")): _*)

    carried.filter(col("_aside") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col("_apay")(p).as(p)): _*)
  }

  /** Forward as-of: for each left row, the single right row with the
    * SMALLEST `rightTime >= leftTime` for the same key — "the next fact
    * at or after the event" (next price tick, next label, next
    * follow-up). The exact mirror of [[asof]]: same tag-union, same ONE
    * key shuffle and within-key sort, but the carried value is the
    * nearest fact AHEAD (`first(ignoreNulls)` over the
    * current-row-to-unbounded-FOLLOWING frame). Equal-time facts are
    * visible to the event, so the tag now orders a fact AFTER an event
    * at the same timestamp. Ties at the same (key, time) resolve to the
    * first in input order — pre-dedupe for determinism, as with [[asof]].
    * A match-window bound (pandas-style `tolerance`) composes by
    * including `rightTime` in `payload` and post-filtering the gap. */
  def asofForward(left: DataFrame, right: DataFrame,
                  leftKey: String, rightKey: String,
                  leftTime: String, rightTime: String,
                  payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payStruct = org.apache.spark.sql.types.StructType(payload.map(p => right.schema(p)))
    // tags flipped vs asof: event (0) before fact (1) at equal time, so
    // the event's FOLLOWING frame includes the equal-time fact
    val l = left.select(
      col(leftKey).as("_ak") +: col(leftTime).as("_at") +: lit(0).as("_aside") +:
        (leftCols.map(col) :+ lit(null).cast(payStruct).as("_apay")): _*)
    val r = right.filter(col(rightTime).isNotNull).select(
      col(rightKey).as("_ak") +: col(rightTime).as("_at") +: lit(1).as("_aside") +:
        (leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
          struct(payload.map(col): _*).as("_apay")): _*)

    val w = Window.partitionBy(col("_ak"))
      .orderBy(col("_at"), col("_aside"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val carried = l.unionByName(r).select(
      (Seq(col("_aside")) ++ leftCols.map(col) :+
        first(col("_apay"), ignoreNulls = true).over(w).as("_apay")): _*)

    carried.filter(col("_aside") === 0)
      .select(leftCols.map(col) ++ payload.map(p => col("_apay")(p).as(p)): _*)
  }
}
