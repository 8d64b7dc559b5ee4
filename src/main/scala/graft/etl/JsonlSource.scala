package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Newline-delimited JSON (JSONL) source — the interchange format of
  * training-data pipelines (one document object per line).
  *
  * Scale contract, deliberately stricter than `spark.read.json`'s
  * defaults:
  *  - The schema is PINNED by the caller. Schema inference reads the
  *    whole input once before the real scan — a full extra pass at
  *    100 TB — and infers different schemas from different samples, so a
  *    pipeline that infers is not reproducible. Pinning also prunes: the
  *    JSON parser materializes only the requested fields.
  *  - Line-delimited only (`multiLine=false`). A JSONL file splits at
  *    newlines, so a 1 TB file fans out across executors; a multi-line
  *    JSON array is ONE unsplittable task — the format itself is the
  *    scale decision.
  *  - Malformed lines survive as rows with every data column null and
  *    the raw line in `corruptCol` (PERMISSIVE mode) — at pipeline scale
  *    a bad shard must not kill the job, but it must stay auditable.
  *    [[badRecords]]/[[goodRecords]] split the result.
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    spark.read
      .schema(schema.add(CorruptCol, StringType, nullable = true))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("multiLine", "false")
      .json(path)
  }

  /** Parsed rows only, corrupt bookkeeping dropped. */
  def goodRecords(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantined rows: every malformed line, data columns null, the raw
    * line in [[CorruptCol]]. Returns the FULL row rather than just the
    * raw text: Spark refuses a raw-file scan whose pruned schema is only
    * the corrupt column (`QUERY_ONLY_CORRUPT_RECORD_COLUMN`), so the
    * legal shapes are this one — project-after-cache if only the raw
    * text is needed. */
  def badRecords(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull)
}
