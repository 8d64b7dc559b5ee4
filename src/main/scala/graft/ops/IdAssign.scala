package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense sequential ID assignment (reference: carrot-transform auto-number
  * fields, `run.py:266-273`, `record_builder.py:151-156`, and the person-ID
  * dictionary `person_helpers.py:90-151`).
  *
  * The reference increments an in-memory counter row-at-a-time. The naive
  * Spark translation — `row_number().over(Window.orderBy(...))` with no
  * partition spec — collapses the whole dataset into ONE partition, a
  * non-starter at 100 TB. An RDD `zipWithIndex` avoids that but runs an
  * eager count job at definition time and pays InternalRow↔Row conversion,
  * breaking whole-stage codegen. This implementation stays entirely in
  * DataFrame land:
  *
  *   1. range-partition by the ordering key (partitions come out in global
  *      key order), sort within partitions;
  *   2. per-partition positions via `row_number` over `spark_partition_id`
  *      (each window partition is exactly one physical partition);
  *   3. partition offsets from a tiny per-partition count aggregate +
  *      running sum, broadcast-joined back.
  *
  * Everything is lazy; the two consumers of the sorted child share its
  * exchange (Catalyst ReusedExchange). IDs are dense, start at
  * `offset + 1`, and follow the global order of `orderCols` (callers must
  * order by a unique key for determinism).
  */
object IdAssign {

  def withDenseId(df: DataFrame, idCol: String, offset: Long, orderCols: Column*): DataFrame = {
    val parallelism = df.sparkSession.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parallelism, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .withColumn("_ia_pid", spark_partition_id())

    val wLocal = Window.partitionBy(col("_ia_pid")).orderBy(orderCols: _*)
    // cached: offsets and positions MUST see the same partition boundaries —
    // without a materialization point, AQE may re-plan the range exchange
    // differently for the two consumers and shift ids across partitions
    val withPos = sorted.withColumn("_ia_pos", row_number().over(wLocal)).cache()

    val counts = withPos.groupBy(col("_ia_pid")).agg(count(lit(1)).as("_ia_cnt"))
    // tiny (one row per partition): the single-partition running sum is fine
    val wCum = Window.orderBy(col("_ia_pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("_ia_off", coalesce(sum(col("_ia_cnt")).over(wCum), lit(0L)))
      .select(col("_ia_pid"), col("_ia_off"))

    withPos.join(broadcast(offsets), Seq("_ia_pid"))
      .withColumn(idCol, col("_ia_off") + col("_ia_pos") + lit(offset))
      .drop("_ia_pid", "_ia_pos", "_ia_off")
  }
}
