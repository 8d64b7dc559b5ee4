package graft.etl

import scala.io.Source
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** OMOP CDM target-schema knowledge: column order per table plus the field
  * "roles" that drive record building.
  *
  * Mirrors the reference's DDL parse (carrot-transform `tools/omopcdm.py:51-137`):
  * a line-oriented scan of the PostgreSQL DDL matching `CREATE TABLE` starts,
  * `name type` field lines and `);` ends, with role classes
  * integer/numeric → numeric, timestamp → datetime, date → date, NOT NULL +
  * numeric → "init to string 0" — then merged with `config/config.json`'s
  * datetime-linked / date-component / person-id / auto-number field maps.
  *
  * All output columns stay StringType end-to-end (SURVEY §1.2): values are
  * verbatim strings in the reference and any cast would reformat them.
  */
final case class OmopSchema(
    allColumns: Map[String, Seq[String]],
    numericFields: Map[String, Set[String]],
    notnullNumericFields: Map[String, Set[String]],
    datetimeFields: Map[String, Seq[String]],
    dateFields: Map[String, Set[String]],
    datetimeLinkedFields: Map[String, Map[String, String]],
    dateFieldComponents: Map[String, Map[String, Map[String, String]]],
    personIdField: Map[String, String],
    autoNumberField: Map[String, String]) {

  def columns(table: String): Seq[String] = allColumns.getOrElse(table, Seq.empty)
  def notnullNumeric(table: String): Set[String] = notnullNumericFields.getOrElse(table, Set.empty)
  def datetimeLinked(table: String): Map[String, String] = datetimeLinkedFields.getOrElse(table, Map.empty)
  def dateComponents(table: String): Map[String, Map[String, String]] = dateFieldComponents.getOrElse(table, Map.empty)
  def isDatetimeField(table: String, field: String): Boolean =
    datetimeFields.getOrElse(table, Seq.empty).contains(field)
}

object OmopSchema {

  private val StartRe    = """^CREATE\s*TABLE\s*(@?[a-zA-Z]+\.)?([a-zA-Z_]+)""".r.unanchored
  private val DatatypeRe = """^\s*([a-z_]+)\s+([a-zA-Z_]+)""".r.unanchored
  private val EndRe      = """.*[)];$""".r

  private val NumericTypes  = Set("integer", "numeric")
  private val DatetimeTypes = Set("timestamp")
  private val DateTypes     = Set("date")

  /** Paths accept the `@carrot/` bundled-resource prefix (see [[AtPath]]);
    * the engine's defaults are `@carrot/config/...`, so no files on disk
    * are needed (reference `tools/args.py:380,389`). */
  def fromFiles(ddlPath: String, configPath: String): OmopSchema = {
    fromStrings(AtPath.readString(ddlPath).linesIterator,
      AtPath.readString(configPath))
  }

  def fromStrings(ddlLines: Iterator[String], configJson: String): OmopSchema = {
    var all      = Map.empty[String, Seq[String]]
    var num      = Map.empty[String, Set[String]]
    var nnNum    = Map.empty[String, Set[String]]
    var dtFields = Map.empty[String, Seq[String]]
    var dFields  = Map.empty[String, Set[String]]

    var inTable = false
    var tab     = ""
    for (raw <- ddlLines) {
      val line = raw.trim
      if (!inTable) {
        StartRe.findFirstMatchIn(line).foreach { m =>
          inTable = true
          tab = m.group(2).toLowerCase
        }
      } else {
        DatatypeRe.findFirstMatchIn(line).foreach { m =>
          val fname = m.group(1)
          val ftype = m.group(2).toLowerCase
          all = all.updated(tab, all.getOrElse(tab, Seq.empty) :+ fname)
          if (NumericTypes(ftype)) {
            num = num.updated(tab, num.getOrElse(tab, Set.empty) + fname)
            if (line.contains("NOT") && line.contains("NULL"))
              nnNum = nnNum.updated(tab, nnNum.getOrElse(tab, Set.empty) + fname)
          }
          if (DatetimeTypes(ftype)) dtFields = dtFields.updated(tab, dtFields.getOrElse(tab, Seq.empty) :+ fname)
          if (DateTypes(ftype)) dFields = dFields.updated(tab, dFields.getOrElse(tab, Set.empty) + fname)
        }
      }
      if (EndRe.findFirstIn(line).isDefined) inTable = false
    }

    val cfg = new ObjectMapper().readTree(configJson)

    def strMap(node: JsonNode): Map[String, String] =
      node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap

    def nested(key: String): Map[String, Map[String, String]] =
      Option(cfg.get(key)).map(_.properties().asScala.map(e => e.getKey -> strMap(e.getValue)).toMap)
        .getOrElse(Map.empty)

    val components: Map[String, Map[String, Map[String, String]]] =
      Option(cfg.get("date_field_components")).map(_.properties().asScala.map { t =>
        t.getKey -> t.getValue.properties().asScala.map(f => f.getKey -> strMap(f.getValue)).toMap
      }.toMap).getOrElse(Map.empty)

    OmopSchema(
      allColumns = all,
      numericFields = num,
      notnullNumericFields = nnNum,
      datetimeFields = dtFields,
      dateFields = dFields,
      datetimeLinkedFields = nested("datetime_linked_fields"),
      dateFieldComponents = components,
      personIdField = Option(cfg.get("person_id_field")).map(strMap).getOrElse(Map.empty),
      autoNumberField = Option(cfg.get("auto_number_field")).map(strMap).getOrElse(Map.empty))
  }
}
