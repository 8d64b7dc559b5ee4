package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Dense sequential ID assignment (reference: carrot-transform auto-number
  * fields, `run.py:266-273`, `record_builder.py:151-156`, and the person-ID
  * dictionary `person_helpers.py:90-151`).
  *
  * The reference increments an in-memory counter row-at-a-time. The naive
  * Spark translation — `row_number().over(Window.orderBy(...))` with no
  * partition spec — collapses the whole dataset into ONE partition, which is
  * a non-starter at 100 TB. Instead we:
  *
  *   1. range-partition by the ordering key (parallel shuffle),
  *   2. sort within each partition,
  *   3. `zipWithIndex` — which runs one lightweight count-per-partition job
  *      and then assigns `partitionOffset + localIndex` in parallel.
  *
  * Cost: one shuffle + one extra count job; no single-partition bottleneck.
  * IDs are dense, start at `offset + 1`, and follow the global order of
  * `orderCols` (callers must order by a unique key for determinism).
  */
object IdAssign {

  def withDenseId(df: DataFrame, idCol: String, offset: Long, orderCols: Column*): DataFrame = {
    val spark  = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*).sortWithinPartitions(orderCols: _*)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, idx) =>
      Row.fromSeq(row.toSeq :+ (offset + idx + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }
}
