package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.DateNorm

/** The metrics/summary subsystem (reference `tools/metrics.py`) as DataFrame
  * aggregations — a hand-rolled grouping-sets over
  * DataKey(source, fieldname, tablename, concept_id, additional):
  *
  *  - input_count: one per source row (`run.py:219-226`)
  *  - input_date_fields: rows dropped by date normalization (key only;
  *    not rendered as a summary column)
  *  - invalid_source_fields: empty data-column values per (src, field, tgt)
  *  - invalid_date_fields: records dropped by the birthdate component parse
  *  - invalid_person_ids: J1 misses per (src, all, tgt)
  *  - output_count: each written record fans out to up to 7 rollup keys
  *    (`metrics.py:191-259`; person rows use out_record[1] as concept and
  *    out_record[2] as additional, non-person rows use out_record[2])
  *
  * Materialization (A3, `metrics.py:305-343`): rows sorted by the
  * "src~field~table~concept~additional" key string, source truncated at the
  * first '.', rows below the output-count threshold dropped.
  */
object CarrotMetrics {

  import CarrotEngine._

  private val KeyCols = Seq("source", "fieldname", "tablename", "concept_id", "additional")

  private def keyed(src: Column, field: Column, table: Column, concept: Column,
                    additional: Column, countType: String, n: Column): Seq[Column] =
    Seq(src.as("source"), field.as("fieldname"), table.as("tablename"),
      concept.as("concept_id"), additional.as("additional"),
      lit(countType).as("count_type"), n.cast("long").as("n"))

  def summary(e: CarrotEngine, threshold: Long): DataFrame = {
    val rules  = e.metricsRules
    val schema = e.metricsSchema

    val parts = Seq.newBuilder[DataFrame]

    // ---- input_count + input_date_fields per source file
    for (src <- rules.sourceTables) {
      val raw = e.metricsRaw(src)
      parts += raw.groupBy().count()
        .select(keyed(lit(src), lit("all"), lit("all"), lit("all"), lit(""), "input_count", col("count")): _*)
      val dateCols = e.metricsDateCols(src)
      if (dateCols.nonEmpty) {
        val dropped = dateCols.map(c => DateNorm.normalise8601(col(c)).isNull).reduce(_ || _)
        parts += raw.filter(dropped).groupBy().count()
          .select(keyed(lit(src), lit("all"), lit("all"), lit("all"), lit(""), "input_date_fields", col("count")): _*)
      }
    }

    // ---- invalid_source_fields per (source, data field, target)
    for (m <- rules.tables) {
      val prepared = e.metricsPrepared(m.source)
      // v1 iterates every mapped data column (term fields AND verbatim-copy
      // source fields); v2's standard builder counts per concept-mapped
      // field and its person builder does not count at all.
      val fields: Seq[String] =
        if (m.target == "person") {
          if (rules.v1Compat) m.conceptMappings.take(1).map(_.sourceField) else Seq.empty
        } else {
          val extra = if (rules.v1Compat) m.conceptMappings.flatMap(_.extraCopies.map(_._1)) else Seq.empty
          (m.conceptMappings.map(_.sourceField) ++ extra).distinct
        }
      for (f <- fields)
        parts += prepared.filter(trim(col(f)) === "").groupBy().count()
          .select(keyed(lit(m.source), lit(f), lit(m.target), lit("all"), lit(""), "invalid_source_fields", col("count")): _*)
    }

    // ---- invalid_date_fields + invalid_person_ids + output_count per target
    for ((target, b) <- e.metricsBuilds) {
      parts += b.candidates.filter(col(HasComp) && !col(CompOk))
        .groupBy(col(SrcCol), col(DatacolCol)).count()
        .select(keyed(col(SrcCol), col(DatacolCol), lit(target), lit("all"), lit(""), "invalid_date_fields", col("count")): _*)

      parts += b.joined.filter(!col(Matched)).groupBy(col(SrcCol)).count()
        .select(keyed(col(SrcCol), lit("all"), lit(target), lit("all"), lit(""), "invalid_person_ids", col("count")): _*)

      // written records grouped once, then fanned to the rollup keys
      val cols = schema.columns(target)
      val c1   = col(cols(1).toLowerCase) // person: gender_concept_id
      val c2   = col(cols(2).toLowerCase) // person: year_of_birth; else concept id
      val g = b.joined.filter(col(Matched))
        .groupBy(col(SrcCol).as("s"), col(DatacolCol).as("f"), c1.as("c1"), c2.as("c2"))
        .count()

      def roll(src: Column, field: Column, table: Column, concept: Column, additional: Column): DataFrame =
        g.select(keyed(src, field, table, concept, additional, "output_count", col("count")): _*)

      parts += roll(col("s"), lit("all"), lit("all"), lit("all"), lit(""))
      parts += roll(lit("all"), lit("all"), lit(target), lit("all"), lit(""))
      parts += roll(col("s"), lit("all"), lit(target), lit("all"), lit(""))
      if (target == "person") {
        parts += roll(col("s"), lit("all"), lit(target), col("c1"), lit(""))
        parts += roll(col("s"), lit("all"), lit(target), col("c1"), col("c2"))
      } else {
        parts += roll(col("s"), col("f"), lit(target), col("c2"), lit(""))
        parts += roll(col("s"), lit("all"), lit(target), col("c2"), lit(""))
        parts += roll(lit("all"), lit("all"), lit(target), col("c2"), lit(""))
        parts += roll(lit("all"), lit("all"), lit("all"), col("c2"), lit(""))
      }
    }

    val counts = parts.result().reduce(_.unionByName(_)).filter(col("n") > 0)

    def sumOf(ct: String): Column =
      coalesce(sum(when(col("count_type") === ct, col("n"))), lit(0L)).cast("long")

    counts
      .groupBy(KeyCols.map(col): _*)
      .agg(
        sumOf("input_count").as("incount"),
        sumOf("invalid_person_ids").as("invalid_persid"),
        sumOf("invalid_date_fields").as("invalid_date"),
        sumOf("invalid_source_fields").as("invalid_source"),
        sumOf("output_count").as("outcount"))
      .filter(col("outcount") >= lit(threshold))
      // the reference sorts by the FULL stringified key (pre-prefix source)
      .withColumn("_sortkey", concat_ws("~", col("source"), col("fieldname"),
        col("tablename"), col("concept_id"), col("additional")))
      .select(
        lit(rules.dataset).as("dsname"),
        regexp_extract(col("source"), "^[^.]*", 0).as("source"),
        col("fieldname").as("source_field"),
        col("tablename").as("target"),
        col("concept_id"), col("additional"),
        col("incount").cast("string").as("incount"),
        col("invalid_persid").cast("string").as("invalid_persid"),
        col("invalid_date").cast("string").as("invalid_date"),
        col("invalid_source").cast("string").as("invalid_source"),
        col("outcount").cast("string").as("outcount"),
        col("_sortkey"))
      .orderBy(col("_sortkey"))
      .drop("_sortkey")
  }
}
