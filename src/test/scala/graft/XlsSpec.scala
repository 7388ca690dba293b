package graft

import graft.engine.{Ingest, Xls}
import org.scalatest.funsuite.AnyFunSuite

import java.io.ByteArrayOutputStream
import java.nio.file.Files

/** Legacy .xls (BIFF8 in CFB) reader, against hand-rolled fixtures in
  * both container layouts: regular-FAT stream (≥ 4096 bytes) and
  * mini-FAT stream (< 4096 bytes). */
class XlsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("regular-FAT .xls: numbers, RK, shared strings, CJK, booleans") {
    val path = XlsFixture.write(mini = false)
    val df = Xls.read(spark, path)
    assert(df.columns.toSeq == Seq("name", "qty", "price", "ok"))
    val rows = df.orderBy("qty").collect()
    assert(rows.length == 3)
    assert(rows(0).getString(0) == "widget")
    assert(rows(0).getLong(1) == 2L)
    assert(rows(0).getDouble(2) == 1.5)
    assert(rows(0).getString(3) == "true")
    assert(rows(1).getString(0) == "bolt 螺栓") // UTF-16 SST string
    assert(rows(1).getLong(1) == 7L)
    assert(rows(1).getDouble(2) == 19.25)
    assert(rows(2).getLong(1) == 400L)  // RK integer
    assert(rows(2).getDouble(2) == 0.75) // RK x100 encoding
  }

  test("mini-FAT .xls (stream under the 4096-byte cutoff)") {
    val path = XlsFixture.write(mini = true)
    val df = Xls.read(spark, path)
    assert(df.columns.toSeq == Seq("name", "qty", "price", "ok"))
    assert(df.count() == 3)
    assert(df.filter(df("name") === "bolt 螺栓").count() == 1)
  }

  test("MULRK, FORMULA cached values, and STRING formula results") {
    val path = XlsFixture.write(mini = false, Some(XlsFixture.richWorkbook()))
    val df = Xls.read(spark, path)
    assert(df.columns.toSeq == Seq("a", "b", "c", "d"))
    val r = df.collect()(0)
    assert(r.getDouble(0) == 1.25)  // MULRK x100 int
    assert(r.getLong(1) == 3L)      // MULRK int
    assert(r.getDouble(2) == 42.5)  // FORMULA cached numeric result
    assert(r.getString(3) == "calc") // FORMULA string result via STRING rec
  }

  test("SST strings spanning CONTINUE records (grbit reset, charset switch)") {
    val path = XlsFixture.write(mini = false, Some(XlsFixture.continuedWorkbook()))
    val df = Xls.read(spark, path)
    assert(df.columns.toSeq == Seq("name"))
    val vals = df.collect().map(_.getString(0)).toSet
    // "hello_world" split 5+6 across the CONTINUE (compressed both sides);
    // "ab菓c" split 2+2 with the continuation switching to UTF-16
    assert(vals == Set("hello_world", "ab菓c"))
  }

  test("Ingest routes .xls by CFB magic and .xlsx by zip magic") {
    val xls = XlsFixture.write(mini = false)
    assert(Xls.isCfb(xls))
    val viaIngest = Ingest.load(spark, xls)
    assert(viaIngest.count() == 3)
    // existing OOXML fixture still routes to the Xlsx reader
    val xlsx = XlsxFixture.write()
    assert(!Xls.isCfb(xlsx))
    assert(Ingest.load(spark, xlsx).count() == 2)
  }
}

/** Hand-rolled BIFF8 workbook inside a minimal [MS-CFB] container —
  * no Excel library involved, mirroring XlsxFixture's approach. */
object XlsFixture {

  private def le16(v: Int): Array[Byte] = Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] = le16(v & 0xFFFF) ++ le16((v >>> 16) & 0xFFFF)

  private def rec(typ: Int, data: Array[Byte]): Array[Byte] =
    le16(typ) ++ le16(data.length) ++ data

  /** BIFF8 workbook stream: globals (BOF, SST, EOF) + one sheet with
    * NUMBER / RK (int and ×100) / LABELSST (incl. UTF-16 CJK) /
    * BOOLERR cells. Header row: name, qty, price, ok. */
  private def workbook(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def bof(dt: Int) = rec(0x0809,
      le16(0x0600) ++ le16(dt) ++ le16(0x0DBB) ++ le16(0x07CC) ++ le32(0) ++ le32(0))

    def sstString(s: String): Array[Byte] = {
      val high = s.exists(_ > 0xFF)
      val chars =
        if (high) s.getBytes("UTF-16LE")
        else s.map(_.toByte).toArray
      le16(s.length) ++ Array((if (high) 1 else 0).toByte) ++ chars
    }
    val strings = Seq("name", "qty", "price", "ok", "widget", "bolt 螺栓", "gear")
    val sst = rec(0x00FC,
      le32(strings.length) ++ le32(strings.length) ++ strings.flatMap(sstString).toArray)

    out.write(bof(0x0005)) // workbook globals
    out.write(sst)
    out.write(rec(0x000A, Array.empty))

    out.write(bof(0x0010)) // worksheet
    def labelSst(r: Int, c: Int, i: Int) =
      rec(0x00FD, le16(r) ++ le16(c) ++ le16(0) ++ le32(i))
    def number(r: Int, c: Int, v: Double) =
      rec(0x0203, le16(r) ++ le16(c) ++ le16(0) ++ {
        val bits = java.lang.Double.doubleToLongBits(v)
        (0 until 8).map(i => ((bits >> (8 * i)) & 0xFF).toByte).toArray
      })
    def rkInt(r: Int, c: Int, v: Int) = // fInt encoding
      rec(0x027E, le16(r) ++ le16(c) ++ le16(0) ++ le32((v << 2) | 2))
    def rkMul100Int(r: Int, c: Int, centi: Int) = // fInt + fMul100
      rec(0x027E, le16(r) ++ le16(c) ++ le16(0) ++ le32((centi << 2) | 3))
    def boolCell(r: Int, c: Int, v: Boolean) =
      rec(0x0205, le16(r) ++ le16(c) ++ le16(0) ++
        Array((if (v) 1 else 0).toByte, 0.toByte))

    // header
    (0 until 4).foreach(c => out.write(labelSst(0, c, c)))
    // widget, 2, 1.5, true
    out.write(labelSst(1, 0, 4)); out.write(number(1, 1, 2.0))
    out.write(number(1, 2, 1.5)); out.write(boolCell(1, 3, true))
    // bolt 螺栓, 7, 19.25, false
    out.write(labelSst(2, 0, 5)); out.write(rkInt(2, 1, 7))
    out.write(number(2, 2, 19.25)); out.write(boolCell(2, 3, false))
    // gear, 400 (RK int), 0.75 (RK ×100), true
    out.write(labelSst(3, 0, 6)); out.write(rkInt(3, 1, 400))
    out.write(rkMul100Int(3, 2, 75)); out.write(boolCell(3, 3, true))
    out.write(rec(0x000A, Array.empty))
    out.toByteArray
  }

  /** Workbook whose SST spans a CONTINUE record, splitting both strings
    * mid-characters: "hello_world" resumes compressed, "ab菓c" resumes
    * with the charset switched to UTF-16 — the two grbit-reset cases of
    * the BIFF8 continued-string rule. Sheet: header cell + 2 rows. */
  def continuedWorkbook(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def bof(dt: Int) = rec(0x0809,
      le16(0x0600) ++ le16(dt) ++ le16(0x0DBB) ++ le16(0x07CC) ++ le32(0) ++ le32(0))
    out.write(bof(0x0005))
    // SST: total=3, unique=3; "name" whole; "hello_world" cch=11 with
    // 5 chars here; continuation carries the rest
    val sstData =
      le32(3) ++ le32(3) ++
        (le16(4) ++ Array(0.toByte) ++ "name".getBytes("ISO-8859-1")) ++
        (le16(11) ++ Array(0.toByte) ++ "hello".getBytes("ISO-8859-1"))
    out.write(rec(0x00FC, sstData))
    // CONTINUE: grbit=0 + "_world", then "ab菓c" cch=4 with 2 compressed
    // chars, then a second CONTINUE switching to UTF-16 for "菓c"
    out.write(rec(0x003C,
      Array(0.toByte) ++ "_world".getBytes("ISO-8859-1") ++
        le16(4) ++ Array(0.toByte) ++ "ab".getBytes("ISO-8859-1")))
    out.write(rec(0x003C, Array(1.toByte) ++ "菓c".getBytes("UTF-16LE")))
    out.write(rec(0x000A, Array.empty))
    out.write(bof(0x0010))
    def labelSst(r: Int, c: Int, i: Int) =
      rec(0x00FD, le16(r) ++ le16(c) ++ le16(0) ++ le32(i))
    out.write(labelSst(0, 0, 0))
    out.write(labelSst(1, 0, 1))
    out.write(labelSst(2, 0, 2))
    out.write(rec(0x000A, Array.empty))
    out.toByteArray
  }

  /** Workbook exercising MULRK (one record, two RK cells), FORMULA with
    * a cached numeric result, and FORMULA + STRING (string result).
    * Header a,b,c,d + one data row. */
  def richWorkbook(): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    def bof(dt: Int) = rec(0x0809,
      le16(0x0600) ++ le16(dt) ++ le16(0x0DBB) ++ le16(0x07CC) ++ le32(0) ++ le32(0))
    out.write(bof(0x0005))
    val strings = Seq("a", "b", "c", "d")
    def sstString(s: String) =
      le16(s.length) ++ Array(0.toByte) ++ s.map(_.toByte).toArray
    out.write(rec(0x00FC,
      le32(strings.length) ++ le32(strings.length) ++ strings.flatMap(sstString).toArray))
    out.write(rec(0x000A, Array.empty))
    out.write(bof(0x0010))
    (0 until 4).foreach(c =>
      out.write(rec(0x00FD, le16(0) ++ le16(c) ++ le16(0) ++ le32(c))))
    // MULRK row 1 cols 0-1: 1.25 (x100-int RK of 125), 3 (int RK)
    out.write(rec(0x00BD, le16(1) ++ le16(0) ++
      le16(0) ++ le32((125 << 2) | 3) ++
      le16(0) ++ le32((3 << 2) | 2) ++
      le16(1)))
    // FORMULA row 1 col 2: cached numeric 42.5 (token stream irrelevant)
    val numBits = java.lang.Double.doubleToLongBits(42.5)
    val cached = (0 until 8).map(i => ((numBits >> (8 * i)) & 0xFF).toByte).toArray
    out.write(rec(0x0006, le16(1) ++ le16(2) ++ le16(0) ++ cached ++
      le16(0) ++ le32(0) ++ le16(0)))
    // FORMULA row 1 col 3: string result marker (byte0=0, bytes6-7=0xFFFF)
    // followed by the STRING record carrying "calc"
    out.write(rec(0x0006, le16(1) ++ le16(3) ++ le16(0) ++
      Array(0.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte, 0.toByte,
        0xFF.toByte, 0xFF.toByte) ++
      le16(0) ++ le32(0) ++ le16(0)))
    out.write(rec(0x0207, le16(4) ++ Array(0.toByte) ++ "calc".getBytes("ISO-8859-1")))
    out.write(rec(0x000A, Array.empty))
    out.toByteArray
  }

  private final val Free = 0xFFFFFFFF
  private final val EndOfChain = 0xFFFFFFFE
  private final val FatSect = 0xFFFFFFFD

  /** Wrap the workbook stream in a CFB container. `mini = true` stores
    * it in the mini stream (64-byte sectors, mini-FAT); otherwise the
    * stream is zero-padded past the 4096-byte cutoff into regular FAT. */
  def write(mini: Boolean, custom: Option[Array[Byte]] = None): String = {
    val wbRaw = custom.getOrElse(workbook())
    val wb = if (mini) wbRaw else java.util.Arrays.copyOf(wbRaw, math.max(wbRaw.length, 4096))
    val sectorSize = 512

    def dirEntry(name: String, objType: Int, start: Int, size: Int,
        child: Int = Free): Array[Byte] = {
      val e = new Array[Byte](128)
      val n = name.getBytes("UTF-16LE")
      System.arraycopy(n, 0, e, 0, n.length)
      System.arraycopy(le16(n.length + 2), 0, e, 64, 2)
      e(66) = objType.toByte
      e(67) = 1 // black
      System.arraycopy(le32(Free), 0, e, 68, 4)  // left sibling
      System.arraycopy(le32(Free), 0, e, 72, 4)  // right sibling
      System.arraycopy(le32(child), 0, e, 76, 4) // child
      System.arraycopy(le32(start), 0, e, 116, 4)
      System.arraycopy(le32(size), 0, e, 120, 4)
      e
    }

    val (sectors, dirSector, firstMiniFat) =
      if (!mini) {
        val nWb = (wb.length + sectorSize - 1) / sectorSize
        // sector 0 = FAT, 1 = directory, 2..1+nWb = workbook
        val fat = Array.fill(sectorSize / 4)(Free)
        fat(0) = FatSect; fat(1) = EndOfChain
        for (i <- 0 until nWb) fat(2 + i) = if (i == nWb - 1) EndOfChain else 3 + i
        val dir = dirEntry("Root Entry", 5, EndOfChain, 0, child = 1) ++
          dirEntry("Workbook", 2, 2, wb.length) ++ new Array[Byte](256)
        val data = fat.flatMap(le32) ++ dir ++ java.util.Arrays.copyOf(wb, nWb * sectorSize)
        (data, 1, EndOfChain)
      } else {
        require(wb.length < 4096, "mini fixture must be under the cutoff")
        val miniSize = 64
        val nMini = (wb.length + miniSize - 1) / miniSize
        val miniStream = java.util.Arrays.copyOf(wb, nMini * miniSize)
        val nMsSectors = (miniStream.length + sectorSize - 1) / sectorSize
        // sector 0 = FAT, 1 = directory, 2 = miniFAT, 3.. = mini stream
        val fat = Array.fill(sectorSize / 4)(Free)
        fat(0) = FatSect; fat(1) = EndOfChain; fat(2) = EndOfChain
        for (i <- 0 until nMsSectors) fat(3 + i) = if (i == nMsSectors - 1) EndOfChain else 4 + i
        val miniFat = Array.fill(sectorSize / 4)(Free)
        for (i <- 0 until nMini) miniFat(i) = if (i == nMini - 1) EndOfChain else i + 1
        val dir = dirEntry("Root Entry", 5, 3, miniStream.length, child = 1) ++
          dirEntry("Workbook", 2, 0, wb.length) ++ new Array[Byte](256)
        val data = fat.flatMap(le32) ++ dir ++ miniFat.flatMap(le32) ++
          java.util.Arrays.copyOf(miniStream, nMsSectors * sectorSize)
        (data, 1, 2)
      }

    val header = new Array[Byte](512)
    val magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte)
    System.arraycopy(magic, 0, header, 0, 8)
    System.arraycopy(le16(0x003E), 0, header, 24, 2) // minor version
    System.arraycopy(le16(0x0003), 0, header, 26, 2) // major version 3
    System.arraycopy(le16(0xFFFE), 0, header, 28, 2) // little-endian
    System.arraycopy(le16(9), 0, header, 30, 2)      // 512-byte sectors
    System.arraycopy(le16(6), 0, header, 32, 2)      // 64-byte mini sectors
    System.arraycopy(le32(1), 0, header, 44, 4)      // one FAT sector
    System.arraycopy(le32(dirSector), 0, header, 48, 4)
    System.arraycopy(le32(4096), 0, header, 56, 4)   // mini cutoff
    System.arraycopy(le32(firstMiniFat), 0, header, 60, 4)
    System.arraycopy(le32(if (mini) 1 else 0), 0, header, 64, 4)
    System.arraycopy(le32(EndOfChain), 0, header, 68, 4) // no DIFAT chain
    System.arraycopy(le32(0), 0, header, 72, 4)
    val difat = Array.fill(109)(Free); difat(0) = 0 // FAT sector 0
    System.arraycopy(difat.flatMap(le32), 0, header, 76, 109 * 4)

    val path = Files.createTempFile("fixture", ".xls")
    Files.write(path, header ++ sectors)
    path.toString
  }
}
