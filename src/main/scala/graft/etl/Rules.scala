package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** The canonical compiled form of a Carrot mapping-rules file ("the query").
  *
  * Both rules dialects (v1 "mapstream" and v2; reference
  * `tools/mappingrules.py:24-117`, `tools/mapping_types.py:5-31`) compile to
  * this one model, which is v2-shaped: per (target table, source table) — a
  * person-id copy, a date multi-assign, and per-source-field concept mappings
  * (value → destField → concept list, `"*"` = wildcard, plus verbatim
  * original-value copy fields).
  *
  * v1 → canonical (SURVEY §7.1):
  *  - dict `term_mapping` rule groups → value mappings (concepts appended in
  *    group order so N matching groups still emit N rows via zip-alignment),
  *  - scalar `term_mapping` → `"*"` wildcard,
  *  - fields without `term_mapping` → `original_value` copies,
  *  - all person rule groups merge into one mapping (ref `mappingrules.py:328-342`),
  *  - `v1Compat` keeps the two behavioral differences: no cross-row person
  *    dedupe (D2) and copy-only rule groups still emitting rows.
  */
final case class ConceptMapping(
    sourceField: String,
    // value (or "*") -> destField -> ordered concept ids
    valueMappings: Map[String, Map[String, Seq[Long]]],
    originalValueFields: Seq[String],
    // v1 only: verbatim copies from OTHER source fields applied to every
    // record of this mapping (e.g. IgG → value_as_number inside an ABresult
    // rule group; ref `tools/core.py:98-102`)
    extraCopies: Seq[(String, String)] = Seq.empty) {

  /** Compile the per-value combination lists (reference
    * `concept_helpers.py:6-44`: zip-aligned by index across dest fields,
    * padding with the last element — NOT a cross product).
    *
    * Dialect difference: v1 fires BOTH the exact-value rule key and the
    * wildcard/scalar key for a matching row (`tools/core.py:49-59` appends
    * both dictkeys); v2 tries exact first, ELSE wildcard
    * (`concept_helpers.py:47-62`). Returns (known-value → combos, fallback
    * combos for values not in the map).
    */
  def effectiveCombos(v1Compat: Boolean): (Map[String, Seq[Map[String, Long]]], Seq[Map[String, Long]]) = {
    val wildcard = valueMappings.get("*").map(Rules.combinations).getOrElse(Seq.empty)
    val known = (valueMappings.keySet - "*").map { v =>
      val exact = Rules.combinations(valueMappings(v))
      v -> (if (v1Compat) exact ++ wildcard else exact)
    }.toMap
    (known, wildcard)
  }
}

final case class TableMapping(
    target: String,
    source: String,
    personIdSource: String,
    personIdDest: String,
    dateSource: String,
    dateDests: Seq[String],
    conceptMappings: Seq[ConceptMapping])

final case class CarrotRules(dataset: String, tables: Seq[TableMapping], v1Compat: Boolean) {
  /** Source tables in rules order — drives processing (and so auto-number) order. */
  def sourceTables: Seq[String] = tables.map(_.source).distinct
  def forSource(src: String): Seq[TableMapping] = tables.filter(_.source == src)
}

object Rules {

  def combinations(destMap: Map[String, Seq[Long]]): Seq[Map[String, Long]] = {
    val nonEmpty = destMap.filter(_._2.nonEmpty)
    if (nonEmpty.isEmpty) Seq(Map.empty)
    else {
      val maxLen = nonEmpty.valuesIterator.map(_.length).max
      (0 until maxLen).map { i =>
        nonEmpty.map { case (dest, ids) => dest -> ids(math.min(i, ids.length - 1)) }
      }
    }
  }

  /** Accepts the `@carrot/` bundled-resource prefix (see [[AtPath]]),
    * matching the reference's PathArg `--rules-file` option
    * (`tools/args.py:341-349`). */
  def fromFile(path: String, schema: OmopSchema): CarrotRules = {
    fromJson(AtPath.readString(path), schema)
  }

  def fromJson(json: String, schema: OmopSchema): CarrotRules = {
    val root    = new ObjectMapper().readTree(json)
    val dataset = Option(root.get("metadata")).flatMap(m => Option(m.get("dataset"))).map(_.asText()).getOrElse("")
    val cdm     = root.get("cdm")
    if (isV2(cdm)) CarrotRules(dataset, parseV2(cdm), v1Compat = false)
    else CarrotRules(dataset, parseV1(cdm, schema), v1Compat = true)
  }

  /** Dialect detection (ref `mappingrules.py:42-60`): v2 iff some table entry
    * value carries all three of person_id_mapping / date_mapping /
    * concept_mappings. */
  private def isV2(cdm: JsonNode): Boolean =
    cdm.properties().asScala.exists { t =>
      t.getValue.properties().asScala.exists { e =>
        val v = e.getValue
        v.has("person_id_mapping") && v.has("date_mapping") && v.has("concept_mappings")
      }
    }

  // ---------------------------------------------------------------- v2 parse

  private def parseV2(cdm: JsonNode): Seq[TableMapping] =
    cdm.properties().asScala.toSeq.flatMap { t =>
      val target = t.getKey
      t.getValue.properties().asScala.toSeq.map { s =>
        val source = s.getKey
        val m      = s.getValue
        val pid    = m.get("person_id_mapping")
        val date   = m.get("date_mapping")
        val cms = m.get("concept_mappings").properties().asScala.toSeq.map { cm =>
          val field = cm.getKey
          var values  = Map.empty[String, Map[String, Seq[Long]]]
          var origs   = Seq.empty[String]
          cm.getValue.properties().asScala.foreach { v =>
            if (v.getKey == "original_value") {
              origs = v.getValue.elements().asScala.map(_.asText()).toSeq
            } else {
              val dests = v.getValue.properties().asScala
                .map(d => d.getKey -> d.getValue.elements().asScala.map(_.asLong()).toSeq).toMap
              values = values.updated(v.getKey, dests)
            }
          }
          ConceptMapping(field, values, origs)
        }
        TableMapping(
          target = target,
          source = source,
          personIdSource = pid.get("source_field").asText(),
          personIdDest = pid.get("dest_field").asText(),
          dateSource = date.get("source_field").asText(),
          dateDests = date.get("dest_field").elements().asScala.map(_.asText()).toSeq,
          conceptMappings = cms)
      }
    }

  // ---------------------------------------------------------------- v1 parse

  /** v1: cdm.<target>.<ruleGroup>.<destField> = {source_table, source_field,
    * [term_mapping: scalar | {value: concept}]}. Field roles are inferred via
    * the OMOP schema exactly like the reference (`mappingrules.py:237-311`):
    * the person-id infield is the one feeding the target's person-id field,
    * the date infield is the one feeding a datetime-typed field. */
  private def parseV1(cdm: JsonNode, schema: OmopSchema): Seq[TableMapping] = {
    final case class V1Field(dest: String, srcTable: String, srcField: String, term: Option[JsonNode])

    val groups: Seq[(String, Seq[V1Field])] = cdm.properties().asScala.toSeq.flatMap { t =>
      val target = t.getKey
      t.getValue.properties().asScala.toSeq.map { g =>
        val fields = g.getValue.properties().asScala.toSeq.map { f =>
          V1Field(f.getKey, f.getValue.get("source_table").asText(),
            f.getValue.get("source_field").asText(), Option(f.getValue.get("term_mapping")))
        }
        target -> fields
      }
    }

    groups.groupBy { case (target, fields) => (target, fields.head.srcTable) }.toSeq
      .sortBy { case ((target, source), _) => (target, source) }
      .map { case ((target, source), grps) =>
        val pidDest = schema.personIdField.getOrElse(target, "person_id")
        val all     = grps.flatMap(_._2)
        val pidSrc  = all.find(_.dest.equalsIgnoreCase(pidDest)).map(_.srcField)
          .getOrElse(sys.error(s"v1 rules: no person-id mapping for $target/$source"))
        // the date infield is the one whose dest is a datetime-typed field
        val dateFields = all.filter(f => schema.isDatetimeField(target, f.dest) && f.term.isEmpty)
        val dateSrc    = dateFields.map(_.srcField).headOption
          .getOrElse(sys.error(s"v1 rules: no date mapping for $target/$source"))
        val dateDests  = dateFields.map(_.dest).distinct

        // group rule-groups by their data field (the one carrying term_mapping);
        // copy-only groups attach to the group's non-role source field.
        var cms = Map.empty[String, ConceptMapping]
        var order = Seq.empty[String]
        for ((_, fields) <- grps) {
          val termed = fields.filter(_.term.isDefined)
          val dataField: Option[String] = termed.headOption.map(_.srcField).orElse {
            fields.find(f => !f.dest.equalsIgnoreCase(pidDest) && !dateDests.contains(f.dest))
              .map(_.srcField)
          }
          dataField.foreach { df =>
            val prev = cms.getOrElse(df, { order :+= df; ConceptMapping(df, Map.empty, Seq.empty) })
            var values = prev.valueMappings
            for (f <- termed if f.srcField == df) {
              f.term.get match {
                case d if d.isObject =>
                  d.properties().asScala.foreach { e =>
                    val vm = values.getOrElse(e.getKey, Map.empty)
                    values = values.updated(e.getKey,
                      vm.updated(f.dest, vm.getOrElse(f.dest, Seq.empty) :+ e.getValue.asLong()))
                  }
                case s => // scalar term_mapping applies to every non-empty value
                  val vm = values.getOrElse("*", Map.empty)
                  values = values.updated("*",
                    vm.updated(f.dest, vm.getOrElse(f.dest, Seq.empty) :+ s.asLong()))
              }
            }
            // fields of this group without term_mapping that aren't role fields = verbatim copies
            val nonRole = fields.filter(f => f.term.isEmpty &&
              !f.dest.equalsIgnoreCase(pidDest) && !dateDests.contains(f.dest))
            val copies = nonRole.filter(_.srcField == df).map(_.dest)
            val extras = nonRole.filter(_.srcField != df).map(f => f.srcField -> f.dest)
            // copy-only group (no term fields at all): emit one row per non-empty
            // value — represented as a wildcard with no concepts.
            val values2 = if (termed.isEmpty && !values.contains("*")) values.updated("*", Map.empty) else values
            cms = cms.updated(df, ConceptMapping(df, values2,
              (prev.originalValueFields ++ copies).distinct,
              (prev.extraCopies ++ extras).distinct))
          }
        }
        TableMapping(target, source, pidSrc, pidDest, dateSrc, dateDests, order.map(cms))
      }
  }
}
