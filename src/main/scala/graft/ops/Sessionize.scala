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

  /** Ordered-sequence funnel: how far through `steps` each user
    * progresses, where step i+1 must occur STRICTLY after the timestamp
    * that satisfied step i — and, with `maxGapSeconds`, within that many
    * seconds of it (the product-analytics conversion window). Semantics
    * are first-touch chained bounded-mins: t1 = min ts of step1, t2 = min
    * ts of step2 in (t1, t1+G], … with NO re-anchoring of earlier steps —
    * deterministic and exactly replayable in plain SQL, which is what the
    * oracle does. Greedy earliest-match over the sorted event array
    * computes exactly that chain (the fold takes the first qualifying
    * event per step and never revisits). Returns one row per user that
    * has ANY step event: (userCol, reached ∈ 0..steps.size) — reached 0
    * means the user has step events but never the first step (e.g.
    * clicks with no view); users with no step events produce no row.
    *
    * Scale shape: the type filter prunes at the scan, then ONE hash
    * shuffle on the user key builds the per-user ordered event array and
    * a codegen'd `aggregate` fold walks it — no window over the corpus,
    * no self-joins (the k-step self-join formulation shuffles k times and
    * explodes on hot users). Per-user state is the step-event count for
    * that user — bounded by funnel activity, not corpus size; a user so
    * hot its events don't fit an array is a bot you filter upstream.
    *
    * Timestamps fold in the `unix_micros` long domain, so the window
    * arithmetic is exact integer math in every engine. */
  def funnel(events: DataFrame, userCol: String, tsCol: String, typeCol: String,
             steps: Seq[String], maxGapSeconds: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepArr = array(steps.map(lit): _*)
    val evs = events.filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).as("_u"), unix_micros(col(tsCol)).as("_ts"), col(typeCol).as("_e"))
      .groupBy(col("_u"))
      .agg(array_sort(collect_list(struct(col("_ts"), col("_e")))).as("_evs"))
    // fold state (r = steps reached, t = ts that satisfied step r);
    // advance when the event is the NEXT step, strictly later, and inside
    // the window. The r-complete guard comes first so
    // element_at(stepArr, r + 1) is never evaluated out of bounds
    // (CaseWhen branches evaluate lazily).
    val folded = aggregate(col("_evs"),
      struct(lit(0).as("r"), lit(null).cast("long").as("t")),
      (acc, ev) => {
        val inWindow = maxGapSeconds match {
          case Some(g) => ev.getField("_ts") <= acc.getField("t") + lit(g * 1000000L)
          case None    => lit(true)
        }
        val advance = ev.getField("_e") === element_at(stepArr, acc.getField("r") + 1) &&
          (acc.getField("t").isNull || (ev.getField("_ts") > acc.getField("t") && inWindow))
        when(acc.getField("r") === steps.size, acc)
          .otherwise(when(advance,
            struct((acc.getField("r") + 1).as("r"), ev.getField("_ts").as("t")))
            .otherwise(acc))
      })
    evs.select(col("_u").as(userCol), folded.getField("r").as("reached"))
  }

  /** Retention cohort matrix: users grouped by the period of their FIRST
    * event (`cohort`), counted once per later period they were active in
    * (`offset` periods after their first). The classic product-analytics
    * retention triangle; run over a filtered frame (e.g. purchases only)
    * for action-based retention.
    *
    * Periods are `floor(epoch_micros / periodSeconds·10⁶)` — pure integer
    * epochs, no calendar semantics, so every engine computes the exact
    * same buckets (micros < 2⁵³ are exact in the IEEE division, and a ts
    * landing exactly on a boundary divides exactly).
    *
    * Scale shape: ONE hash shuffle on the user key aggregates each user's
    * first period AND distinct-period set together (`min` + `collect_set`
    * in the same agg — no join back to the events), then the exploded
    * (cohort, offset) pairs — already distinct per user by construction —
    * aggregate on narrow keys. Per-user state is its distinct-period set:
    * bounded by the observation window, not event volume. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
                       periodSeconds: Long): DataFrame = {
    require(periodSeconds > 0, "periodSeconds must be positive")
    val period = floor(unix_micros(col(tsCol)) / lit(periodSeconds * 1000000.0)).cast("long")
    events.select(col(userCol).as("_u"), period.as("_p"))
      .groupBy(col("_u"))
      .agg(min(col("_p")).as("_c"), collect_set(col("_p")).as("_ps"))
      .select(col("_c"), explode(col("_ps")).as("_p"))
      .select(col("_c").as("cohort"), (col("_p") - col("_c")).cast("int").as("offset"))
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
  }
}
