package graft.engine

import java.io.ByteArrayInputStream
import javax.xml.parsers.DocumentBuilderFactory

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.w3c.dom.Element

/** Flat row-set XML ingestion — the reference's own roadmap names XML as
  * a tabular data source (/root/reference/README.md:104 "数据源扩展:
  * 支持 JSON、XML"), and like the xlsx path (engine.Xlsx) there is no
  * offline Spark builtin, so the parse is a small hardened JAXP pass on
  * the driver with the DISTRIBUTED frame built through the same shared
  * type-inference as Excel ([[Xlsx.fromCells]]: Long → Double → String,
  * pandas-style). Upload-sized files only — the same driver-side bound
  * as xlsx/xls, gated upstream by the workspace's 16 MB cap.
  *
  * Accepted shape: one root element whose element children are the
  * records; each record's fields are either its element children
  * (`<row><a>1</a><b>x</b></row>`) or, for childless records, its
  * attributes (`<row a="1" b="x"/>`). The header is the union of field
  * names in first-appearance order; missing fields are NULL. Anything
  * deeper (a field with its own element children) is rejected by name —
  * nested documents are not a table, and silently flattening them would
  * misread the user's data.
  *
  * Hardening mirrors [[Xlsx]]: DOCTYPE is disallowed outright (no
  * external-entity resolution on untrusted uploads), and any parser
  * failure surfaces as IllegalArgumentException naming the file, never
  * a raw SAXException from parser internals.
  */
object Xml {

  def read(spark: SparkSession, path: String): DataFrame = {
    val (header, rows) =
      try parse(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      catch {
        case e: IllegalArgumentException => throw e
        case scala.util.control.NonFatal(e) => throw new IllegalArgumentException(
          s"corrupt .xml file $path: ${e.getClass.getSimpleName}: ${e.getMessage}", e)
      }
    require(header.nonEmpty, s"Empty XML row set in $path")
    Xlsx.fromCells(spark, header, rows)
  }

  /** → (header, data rows) as raw string cells (null = missing). */
  private[graft] def parse(bytes: Array[Byte]): (Seq[String], Seq[Array[String]]) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // defensive: no doctype → no external entity resolution (XXE)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
    val root = doc.getDocumentElement
    val records = children(root)
    val header = scala.collection.mutable.LinkedHashSet.empty[String]
    val fieldMaps = records.map { rec =>
      val kids = children(rec)
      val fields: Seq[(String, String)] =
        if (kids.nonEmpty) kids.map { k =>
          require(children(k).isEmpty,
            s"nested XML under field <${k.getTagName}> of record <${rec.getTagName}> — " +
              "only flat row-set XML (record elements with scalar fields or attributes) is supported")
          k.getTagName -> k.getTextContent.trim
        }
        else {
          val attrs = rec.getAttributes
          (0 until attrs.getLength).map { i =>
            val a = attrs.item(i)
            a.getNodeName -> a.getNodeValue
          }
        }
      fields.foreach { case (n, _) => header += n }
      fields.toMap
    }
    val names = header.toSeq
    val rows = fieldMaps.map(m => names.map(n => m.getOrElse(n, null)).toArray)
    (names, rows)
  }

  private def children(e: Element): Seq[Element] = {
    val nl = e.getChildNodes
    (0 until nl.getLength).map(nl.item).collect { case el: Element => el }
  }
}
