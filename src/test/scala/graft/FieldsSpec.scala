package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fields.FieldExtractor

/** X5: schema-guided field harvesting from contract-markdown
  * (replaces /root/reference/mvp/utils/json_extractor.py:9-27). */
class FieldsSpec extends AnyFunSuite {

  private val md =
    """# Quarterly Report
      |
      |Revenue: **1,234** units sold this quarter.
      |
      || Col A | Col B |
      || --- | --- |
      || 42 | **99** |
      || 7 | 8 |
      |
      |## Growth
      |
      |Strong growth across segments.""".stripMargin

  test("schemaProperties parses top-level property names only") {
    val s = """{"type":"object","properties":{"name":{"type":"string"},
              |"nested":{"type":"object","properties":{"inner":{"type":"string"}}},
              |"age":{"type":"integer"}}}""".stripMargin
    assert(FieldExtractor.schemaProperties(s).contains(Vector("name", "nested", "age")))
    assert(FieldExtractor.schemaProperties("""{"no":"props"}""").isEmpty)
    assert(FieldExtractor.schemaProperties("{broken").isEmpty)
    assert(FieldExtractor.schemaProperties(null).isEmpty)
  }

  test("key:value lines matched case/space-folded, styling stripped") {
    val r = FieldExtractor.harvest(md, Vector("revenue")).get
    assert(r("revenue") == "1,234 units sold this quarter.")
  }

  test("table header -> first data row; bold stripped from cells") {
    val r = FieldExtractor.harvest(md, Vector("Col A", "col b")).get
    assert(r("Col A") == "42")
    assert(r("col b") == "99")
  }

  test("heading -> first following paragraph") {
    val r = FieldExtractor.harvest(md, Vector("growth")).get
    assert(r("growth") == "Strong growth across segments.")
  }

  test("null for irrelevant documents (prompt.py:25-28 rule)") {
    assert(FieldExtractor.harvest(md, Vector("nonexistent", "also missing")).isEmpty)
    assert(FieldExtractor.extractFields(md, """{"properties":{"zzz":{"t":"s"}}}""").isEmpty)
    assert(FieldExtractor.extractFields("", """{"properties":{"a":{}}}""").isEmpty)
  }

  test("priority: key:value wins over table and heading; first match wins") {
    val doc = "growth: from kv line\n\n## Growth\n\nfrom heading"
    val r = FieldExtractor.harvest(doc, Vector("growth")).get
    assert(r("growth") == "from kv line")
  }

  test("escaped pipes in table cells survive") {
    val doc = "| name |\n| --- |\n| a\\|b |"
    val r = FieldExtractor.harvest(doc, Vector("name")).get
    assert(r("name") == "a|b")
  }

  test("end-to-end extractFields on schema string") {
    val schema = """{"type":"object","properties":{"Col A":{"type":"string"},"Growth":{"type":"string"}}}"""
    val r = FieldExtractor.extractFields(md, schema).get
    assert(r == Map("Col A" -> "42", "Growth" -> "Strong growth across segments."))
  }
}
