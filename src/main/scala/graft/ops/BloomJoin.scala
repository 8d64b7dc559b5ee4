package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Bloom-filter semi-join reduction: before shuffling a huge fact table into
  * a join, probe each fact row against a Bloom filter built over the dim
  * side's join keys and drop the rows that cannot match. This is the
  * pattern Spark's own runtime row-level filtering applies inside the
  * optimizer (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which only
  * fires on its own heuristics); exposing it as an explicit operator lets a
  * pipeline force the reduction when it KNOWS the dim side is selective —
  * e.g. joining 100 TB of documents against this week's small partner list.
  *
  * Mechanics: one pass over dim builds the sketch with Spark's native
  * `BloomFilterAggregate` (partial-aggregated — each task builds a local
  * filter, merged with bitwise OR; same class the optimizer injects). The
  * finished filter is a few MB held as a literal — the same driver-resident
  * footprint as any broadcast variable — and the probe is the codegen'd
  * `BloomFilterMightContain` over xxhash64(key): no UDF, no shuffle added.
  * False positives only let extra rows THROUGH to the exact join, so the
  * join result is bit-identical to the unfiltered plan; what changes is how
  * many fact bytes reach the shuffle.
  */
object BloomJoin {

  /** Inner-join `fact` to `dim` on `factKey == dimKey`, pre-filtering fact
    * with a Bloom filter over dim's keys. `expectedDimRows` sizes the
    * sketch (overestimating costs bits, underestimating costs false-
    * positive rate — both safe). */
  def bloomFilteredJoin(fact: DataFrame, dim: DataFrame,
                        factKey: String, dimKey: String,
                        expectedDimRows: Long = 1000000L): DataFrame = {
    val agg = ColumnBridge.toColumn(
      new BloomFilterAggregate(
        ColumnBridge.toExpr(xxhash64(col(dimKey))), expectedDimRows)
        .toAggregateExpression())
    // one job over dim; the sketch itself is the only thing collected
    val sketch = dim.select(agg.as("bf")).head.getAs[Array[Byte]](0)
    val might = ColumnBridge.toColumn(BloomFilterMightContain(
      ColumnBridge.toExpr(lit(sketch)),
      ColumnBridge.toExpr(xxhash64(col(factKey)))))
    fact.filter(might).join(dim, col(factKey) === col(dimKey))
  }
}
