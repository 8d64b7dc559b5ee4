package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Schema conformance: coerce an arriving DataFrame onto a target schema
  * — the guard between heterogeneous ingest (JSONL shards from different
  * crawlers, CSV drops with drifting columns) and every downstream
  * operator that assumes one layout.
  *
  * Rules, applied as ONE projection (no shuffle, codegen'd casts):
  *  - columns present in both: cast to the target type (Spark cast
  *    semantics — unparseable values become null under non-ANSI cast via
  *    `try_cast`, so one bad shard cannot abort the pipeline);
  *  - target columns missing from the input: typed null columns
  *    (or abort when `failOnMissing` — a column that silently becomes
  *    all-null can poison a training corpus quietly);
  *  - input columns absent from the target: dropped (or abort when
  *    `failOnExtra`, for pipelines where surprise columns mean a
  *    mis-tagged source);
  *  - output column order = target order (positional writers depend on
  *    it).
  */
object Conform {

  def conform(df: DataFrame, target: StructType,
              failOnMissing: Boolean = false,
              failOnExtra: Boolean = false): DataFrame = {
    val have = df.columns.toSet
    val missing = target.fieldNames.filterNot(have)
    val extra = df.columns.filterNot(target.fieldNames.toSet)
    if (failOnMissing) require(missing.isEmpty,
      s"input is missing target columns: ${missing.mkString(", ")}")
    if (failOnExtra) require(extra.isEmpty,
      s"input has unexpected columns: ${extra.mkString(", ")}")
    df.select(target.fields.toSeq.map { f =>
      if (have(f.name)) col(f.name).try_cast(f.dataType.sql).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }
}
