package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.etl._

class RulesSpec extends AnyFunSuite {

  test("combinations zip-align and pad with the last element") {
    // reference concept_helpers.py docstring example
    assert(Rules.combinations(Map(
      "a" -> Seq(1L, 2L), "b" -> Seq(10L, 20L))) ==
      Seq(Map("a" -> 1L, "b" -> 10L), Map("a" -> 2L, "b" -> 20L)))
    // uneven lengths pad with last
    assert(Rules.combinations(Map("a" -> Seq(1L, 2L, 3L), "b" -> Seq(10L))) ==
      Seq(Map("a" -> 1L, "b" -> 10L), Map("a" -> 2L, "b" -> 10L), Map("a" -> 3L, "b" -> 10L)))
    assert(Rules.combinations(Map.empty) == Seq(Map.empty))
  }

  test("v2 dialect detection and parse") {
    val r = Rules.fromFile("/root/reference/tests/test_V2/rules-v2.json", Golden.schema)
    assert(!r.v1Compat)
    assert(r.tables.map(_.target).toSet == Set("measurement", "observation", "person"))
    val m = r.tables.find(_.target == "measurement").get
    assert(m.source == "src_WEIGHT.csv" && m.personIdSource == "person_id")
    assert(m.dateDests == Seq("measurement_datetime"))
    val cm = m.conceptMappings.head
    assert(cm.sourceField == "body_kgs")
    assert(cm.valueMappings("*")("measurement_concept_id") == Seq(35811769L))
    assert(cm.originalValueFields == Seq("measurement_source_value", "value_as_number"))
  }

  test("v1 parse canonicalizes groups, person groups merge") {
    val td = "/root/reference/tests/test_data"
    val r = Rules.fromFile(s"$td/integration_test1/transform-rules.json", Golden.schema)
    assert(r.v1Compat)
    val p = r.tables.find(_.target == "person").get
    val g = p.conceptMappings.find(_.sourceField == "gender_source_value").get
    assert(g.valueMappings("male")("gender_concept_id") == Seq(8507L))
    assert(g.valueMappings("female")("gender_concept_id") == Seq(8532L))
    val o = r.tables.find(_.target == "observation").get
    val sm = o.conceptMappings.find(_.sourceField == "observation_source_value").get
    assert(sm.valueMappings("NEVER_SMOKER")("observation_concept_id") == Seq(35821355L))
  }

  test("v1 exact+wildcard both fire; v2 exact-else-wildcard") {
    val cm = ConceptMapping("f",
      Map("x" -> Map("d" -> Seq(1L)), "*" -> Map("d" -> Seq(9L))), Seq.empty)
    val (k1, f1) = cm.effectiveCombos(v1Compat = true)
    assert(k1("x") == Seq(Map("d" -> 1L), Map("d" -> 9L)) && f1 == Seq(Map("d" -> 9L)))
    val (k2, f2) = cm.effectiveCombos(v1Compat = false)
    assert(k2("x") == Seq(Map("d" -> 1L)) && f2 == Seq(Map("d" -> 9L)))
  }

  test("OmopSchema DDL parse roles") {
    val s = Golden.schema
    assert(s.columns("person").take(3) == Seq("person_id", "gender_concept_id", "year_of_birth"))
    assert(s.notnullNumeric("person").contains("gender_concept_id"))
    assert(s.isDatetimeField("person", "birth_datetime"))
    assert(s.datetimeLinked("measurement") == Map("measurement_datetime" -> "measurement_date"))
    assert(s.dateComponents("person")("birth_datetime")("year") == "year_of_birth")
    assert(s.autoNumberField("measurement") == "measurement_id")
    assert(s.personIdField("observation") == "person_id")
  }
}
