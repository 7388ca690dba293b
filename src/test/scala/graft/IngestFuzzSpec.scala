package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Ingest, Xls}

/** Adversarial ingestion fixtures (VERDICT r11 #6): the shell's readers
  * are spec-tested on well-formed files elsewhere (EngineSpec, XlsSpec);
  * this suite feeds malformed/truncated/mixed-type inputs and pins that
  * every one is REJECTED with a clear, file-naming error (or degrades by
  * the documented rule), with no hang and no raw parser-internal
  * exception (ZipException, ArrayIndexOutOfBounds) escaping.
  */
class IngestFuzzSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def write(suffix: String, bytes: Array[Byte]): String = {
    val p = Files.createTempFile("fuzz", suffix)
    Files.write(p, bytes)
    p.toString
  }
  private def write(suffix: String, text: String): String =
    write(suffix, text.getBytes("UTF-8"))

  // ---- xlsx: zip-level corruption -------------------------------------

  test("truncated zip central directory rejects, naming the file") {
    val whole = Files.readAllBytes(Paths.get(XlsxFixture.write()))
    // chop inside the central directory at the tail of the archive
    val cut = java.util.Arrays.copyOf(whole, (whole.length * 0.6).toInt)
    val path = write(".xlsx", cut)
    val e = intercept[IllegalArgumentException] { Ingest.load(spark, path) }
    assert(e.getMessage.contains(path))
    assert(e.getMessage.contains("xlsx"))
  }

  test("random bytes with an .xlsx extension reject cleanly") {
    val rnd = new scala.util.Random(42)
    val junk = Array.fill[Byte](4096)(rnd.nextInt().toByte)
    junk(0) = 'P'; junk(1) = 'K' // zip-ish magic, still not a zip
    val path = write(".xlsx", junk)
    val e = intercept[IllegalArgumentException] { Ingest.load(spark, path) }
    assert(e.getMessage.contains(path))
  }

  test("a zip that is valid but contains no worksheet names the problem") {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val p = Files.createTempFile("fuzz", ".xlsx")
    val zos = new ZipOutputStream(Files.newOutputStream(p))
    zos.putNextEntry(new ZipEntry("readme.txt")); zos.write("hi".getBytes); zos.closeEntry()
    zos.close()
    val e = intercept[IllegalArgumentException] { Ingest.load(spark, p.toString) }
    assert(e.getMessage.contains("No worksheet"))
  }

  // ---- xls: CFB/BIFF8-level corruption --------------------------------

  test("BIFF8 record with a wrong (overlong) length rejects cleanly") {
    // an SST record claiming 1000 unique strings with 2 bytes of payload:
    // the record cursor would otherwise walk off its segment list
    def le16(v: Int) = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int) = le16(v & 0xFFFF) ++ le16((v >>> 16) & 0xFFFF)
    def rec(t: Int, d: Array[Byte]) = le16(t) ++ le16(d.length) ++ d
    val bogusSst = rec(0x0809, le16(0x0600) ++ le16(5) ++ le16(0) ++ le16(0) ++ le32(0) ++ le32(0)) ++
      rec(0x00FC, le32(1000) ++ le32(1000) ++ le16(5)) ++
      rec(0x000A, Array.empty[Byte])
    val path = XlsFixture.write(mini = false, custom = Some(bogusSst))
    val e = intercept[IllegalArgumentException] { Xls.read(spark, path) }
    assert(e.getMessage.contains("corrupt .xls"))
    assert(e.getMessage.contains(path))
  }

  test("CFB magic followed by garbage rejects cleanly") {
    val bytes = new Array[Byte](1024)
    Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte).copyToArray(bytes)
    val path = write(".xls", bytes)
    assert(Xls.isCfb(path))
    val e = intercept[IllegalArgumentException] { Ingest.load(spark, path) }
    assert(e.getMessage.contains(path))
  }

  test("truncated CFB (under one header sector) is rejected as non-CFB") {
    val path = write(".xls", Array[Byte](0xD0.toByte, 0xCF.toByte, 0x11, 0xE0.toByte))
    val e = intercept[IllegalArgumentException] { Ingest.load(spark, path) }
    assert(e.getMessage.toLowerCase.contains("cfb") ||
      e.getMessage.contains("OLE2") || e.getMessage.contains(path))
  }

  // ---- JSON: drift and malformed lines --------------------------------

  test("JSONL with schema drift mid-file unions columns, nulls the gaps") {
    val path = write(".json",
      """{"a": 1, "b": "x"}
        |{"a": 2, "c": true}
        |{"a": 3, "b": "y", "c": false}
        |""".stripMargin)
    val df = Ingest.load(spark, path)
    assert(df.columns.sorted.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 3)
    // drifted-away fields are null, not errors
    assert(df.filter("b IS NULL").count() == 1)
    assert(df.filter("c IS NULL").count() == 1)
  }

  test("JSONL with an unparseable line mid-file keeps the good rows") {
    val path = write(".json",
      """{"a": 1}
        |{oops this is not json
        |{"a": 3}
        |""".stripMargin)
    val df = Ingest.load(spark, path)
    assert(df.count() == 2, "DROPMALFORMED keeps exactly the parseable rows")
    assert(!df.columns.contains("_corrupt_record"))
  }

  test("a scalar JSON document is an unsupported shape") {
    val path = write(".json", "42\n")
    val e = intercept[IllegalArgumentException] { Ingest.load(spark, path) }
    assert(e.getMessage.contains("Unsupported JSON shape"))
  }

  // ---- CSV: ragged rows and degenerate files --------------------------

  test("CSV with ragged rows: short rows null-pad, long rows drop extras") {
    val path = write(".csv",
      """a,b,c
        |1,2
        |4,5,6,7
        |8,9,10
        |""".stripMargin)
    val df = Ingest.load(spark, path)
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    assert(df.count() == 3)
    val rows = df.orderBy("a").collect()
    assert(rows(0).isNullAt(2), "short row pads with null")
    assert(rows(1).toSeq == Seq(4, 5, 6), "long row drops the extra cell")
  }

  test("header-only CSV hits the empty-result gate") {
    val path = write(".csv", "a,b,c\n")
    val e = intercept[IllegalArgumentException] { Ingest.load(spark, path) }
    assert(e.getMessage.contains("no data"))
  }

  test("zero-byte file rejects rather than hanging") {
    val path = write(".csv", "")
    intercept[Exception] { Ingest.load(spark, path) }
  }
}
