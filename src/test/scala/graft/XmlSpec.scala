package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Ingest, Xml}

/** Flat row-set XML ingestion (the reference roadmap's XML source):
  * shape acceptance, shared type inference, and the hardening contract
  * (clear IllegalArgumentException, never parser internals; no DOCTYPE). */
class XmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def write(name: String, content: String): String = {
    val p = java.nio.file.Files.createTempDirectory("graft-xml").resolve(name)
    java.nio.file.Files.write(p, content.getBytes("UTF-8"))
    p.toString
  }

  test("element-field records load with pandas-style type inference") {
    val path = write("t.xml",
      """<rows>
        |  <row><id>1</id><name>alpha</name><price>9.5</price></row>
        |  <row><id>2</id><name>beta</name><price>3</price></row>
        |</rows>""".stripMargin)
    val df = Ingest.load(spark, path)
    assert(df.columns.toSeq == Seq("id", "name", "price"))
    assert(df.schema("id").dataType.typeName == "long")
    assert(df.schema("price").dataType.typeName == "double") // 9.5 forces double
    assert(df.count() == 2)
    assert(df.orderBy("id").collect()(0).getString(1) == "alpha")
  }

  test("attribute records load; missing fields are NULL") {
    val path = write("a.xml",
      """<data>
        |  <item a="1" b="x"/>
        |  <item a="2" c="y"/>
        |</data>""".stripMargin)
    val df = Ingest.load(spark, path)
    assert(df.columns.toSeq == Seq("a", "b", "c")) // union, first-appearance order
    val rows = df.orderBy("a").collect()
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "y")
  }

  test("queries run against an ingested XML table through the gateway") {
    val path = write("q.xml",
      """<rows>
        |  <r><grp>a</grp><v>10</v></r>
        |  <r><grp>a</grp><v>20</v></r>
        |  <r><grp>b</grp><v>5</v></r>
        |</rows>""".stripMargin)
    Ingest.load(spark, path).createOrReplaceTempView("xml_t")
    val got = graft.engine.SqlGateway.run(spark,
      "SELECT grp, SUM(v) AS s FROM xml_t GROUP BY grp ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 30L), ("b", 5L)))
  }

  test("nested structures are rejected by name, not flattened") {
    val path = write("n.xml",
      "<rows><row><addr><city>x</city></addr></row></rows>")
    val e = intercept[IllegalArgumentException](Ingest.load(spark, path))
    assert(e.getMessage.contains("nested XML") && e.getMessage.contains("addr"))
  }

  test("DOCTYPE is refused outright (no entity resolution on uploads)") {
    val path = write("x.xml",
      """<?xml version="1.0"?>
        |<!DOCTYPE rows [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
        |<rows><row><a>&xxe;</a></row></rows>""".stripMargin)
    val e = intercept[IllegalArgumentException](Ingest.load(spark, path))
    assert(e.getMessage.contains(".xml"))
  }

  test("garbage bytes and empty row sets reject with the file named") {
    val g = write("g.xml", "not xml at all <<<")
    val eg = intercept[IllegalArgumentException](Ingest.load(spark, g))
    assert(eg.getMessage.contains("g.xml"))
    val empty = write("e.xml", "<rows></rows>")
    intercept[IllegalArgumentException](Ingest.load(spark, empty))
  }

  test("whitespace-only text nodes between records are ignored") {
    val (header, rows) = Xml.parse(
      "<t>\n  <r x=\"1\"/>\n  <r x=\"2\"/>\n</t>".getBytes("UTF-8"))
    assert(header == Seq("x") && rows.map(_.head).toSeq == Seq("1", "2"))
  }
}
