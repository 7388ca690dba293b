package graft.engine

import java.io.ByteArrayInputStream
import java.util.zip.ZipFile
import javax.xml.parsers.DocumentBuilderFactory

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import org.w3c.dom.Element

/** Minimal .xlsx reader (SURVEY.md §2 Tier A3; /root/reference/doc.py:47–49
  * reads Excel via pandas/openpyxl).
  *
  * No POI ships in /opt/spark/jars, so this parses the OOXML container
  * directly: xl/sharedStrings.xml + the first worksheet under
  * xl/worksheets/. Driver-side by design — the reference's Excel path is
  * also a driver-side pandas parse capped at 16 MB uploads
  * (/root/reference/app.py:20). Large-scale data does not arrive as xlsx.
  *
  * Supported: shared strings (t="s"), inline strings (t="inlineStr"),
  * numbers, booleans (t="b"), formula cached values. First row = header.
  * Column types inferred Long → Double → String, like pandas inference.
  * Legacy binary .xls is handled by the sibling [[Xls]] BIFF8 reader.
  */
object Xlsx {

  def read(spark: SparkSession, path: String): DataFrame = {
    // A hand-rolled container parser cannot enumerate every corruption
    // mode (truncated central directory, chopped XML, bogus cell refs) —
    // the CONTRACT is: any malformed file rejects with a clear
    // IllegalArgumentException naming the file, never a raw
    // ZipException/SAXException/index error from parser internals.
    val (header, rows) =
      try parse(path)
      catch {
        case e: IllegalArgumentException => throw e
        case scala.util.control.NonFatal(e) => throw new IllegalArgumentException(
          s"corrupt .xlsx (zip/OOXML) file $path: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}", e)
      }
    require(header.nonEmpty, s"Empty xlsx sheet in $path")
    fromCells(spark, header, rows)
  }

  /** header + string cells → typed DataFrame (shared with [[Xls]]). */
  private[engine] def fromCells(spark: SparkSession, header: Seq[String],
      rows: Seq[Array[String]]): DataFrame = {
    val types = inferTypes(header.length, rows)
    val schema = StructType(header.zip(types).map { case (n, t) => StructField(n, t, nullable = true) })
    val data: Seq[Row] = rows.map { r =>
      Row.fromSeq(types.zipWithIndex.map { case (t, i) =>
        val v = if (i < r.length) r(i) else null
        coerce(v, t)
      }.toIndexedSeq)
    }.toIndexedSeq
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
  }

  /** → (header, data rows) as raw string cells (null = missing). */
  private[engine] def parse(path: String): (Seq[String], Seq[Array[String]]) = {
    val zip = new ZipFile(path)
    try {
      val shared: IndexedSeq[String] = Option(zip.getEntry("xl/sharedStrings.xml")) match {
        case Some(e) =>
          val doc = parseXml(zip.getInputStream(e).readAllBytes())
          val sis = doc.getElementsByTagName("si")
          (0 until sis.getLength).map { i =>
            // concatenate all <t> descendants (handles rich-text runs)
            val ts = sis.item(i).asInstanceOf[Element].getElementsByTagName("t")
            (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
          }
        case None => IndexedSeq.empty
      }
      val sheetEntry = {
        import scala.jdk.CollectionConverters._
        zip.entries().asScala
          .filter(e => e.getName.matches("xl/worksheets/sheet\\d+\\.xml"))
          .toSeq.sortBy(_.getName).headOption
          .getOrElse(throw new IllegalArgumentException(s"No worksheet found in $path"))
      }
      val doc = parseXml(zip.getInputStream(sheetEntry).readAllBytes())
      val rowNodes = doc.getElementsByTagName("row")
      val rows = ArrayBuffer[Array[String]]()
      var width = 0
      (0 until rowNodes.getLength).foreach { i =>
        val cells = rowNodes.item(i).asInstanceOf[Element].getElementsByTagName("c")
        val byCol = ArrayBuffer[(Int, String)]()
        (0 until cells.getLength).foreach { j =>
          val c = cells.item(j).asInstanceOf[Element]
          val colIdx = colIndex(c.getAttribute("r"))
          val t = c.getAttribute("t")
          val value: String = t match {
            case "s" =>
              val vs = c.getElementsByTagName("v")
              if (vs.getLength == 0) null else shared(vs.item(0).getTextContent.trim.toInt)
            case "inlineStr" =>
              val ts = c.getElementsByTagName("t")
              (0 until ts.getLength).map(k => ts.item(k).getTextContent).mkString
            case "b" =>
              val vs = c.getElementsByTagName("v")
              if (vs.getLength == 0) null else if (vs.item(0).getTextContent.trim == "1") "true" else "false"
            case _ => // number, str (formula string), or empty
              val vs = c.getElementsByTagName("v")
              if (vs.getLength == 0) null else vs.item(0).getTextContent
          }
          byCol += ((colIdx, value))
          width = math.max(width, colIdx + 1)
        }
        val arr = Array.fill[String](width)(null)
        byCol.foreach { case (ci, v) => if (ci < arr.length) arr(ci) = v }
        rows += arr
      }
      if (rows.isEmpty) (Seq.empty, Seq.empty)
      else {
        val header = rows.head.zipWithIndex.map { case (h, i) => if (h == null) s"_c$i" else h }.toSeq
        (header, rows.tail.map(r => if (r.length >= header.length) r else r.padTo(header.length, null)).toSeq)
      }
    } finally zip.close()
  }

  private def parseXml(bytes: Array[Byte]) = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // defensive: no external entity resolution on untrusted uploads
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
  }

  /** "BC12" → 0-based column index 54. */
  private[graft] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    if (letters.isEmpty) 0
    else letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  private def inferTypes(width: Int, rows: Seq[Array[String]]): Seq[DataType] =
    (0 until width).map { i =>
      val vs = rows.flatMap(r => Option(if (i < r.length) r(i) else null))
      if (vs.isEmpty) StringType
      else if (vs.forall(v => v.toLongOption.isDefined)) LongType
      else if (vs.forall(v => v.toDoubleOption.isDefined)) DoubleType
      else StringType
    }

  private def coerce(v: String, t: DataType): Any =
    if (v == null) null
    else t match {
      case LongType   => v.toLong
      case DoubleType => v.toDouble
      case _          => v
    }
}
