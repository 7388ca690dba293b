package graft.engine

import java.nio.file.{Files, Paths}

import scala.collection.mutable.{ArrayBuffer, LinkedHashMap}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal legacy binary .xls (BIFF8) reader — the last Tier-A3 format
  * (the reference reads .xls via pandas/xlrd, doc.py:47–49). No POI or
  * xlrd equivalent ships offline, so this parses the two public formats
  * directly ([MS-CFB] compound file container + [MS-XLS] BIFF8 records):
  *
  *  - CFB: header → DIFAT → FAT → directory; the `Workbook`/`Book`
  *    stream is reassembled from its sector chain (mini-FAT chain inside
  *    the root mini stream for streams under the 4096-byte cutoff).
  *  - BIFF8: globals substream (SST with CONTINUE-spanning unicode
  *    strings) then the first worksheet substream's cell records:
  *    NUMBER, RK, MULRK, LABELSST, LABEL, BOOLERR, FORMULA(+STRING).
  *
  * Driver-side by design, like the xlsx path: uploads are capped at
  * 16 MB and large-scale data does not arrive as .xls. First row is the
  * header; types are inferred Long → Double → String ([[Xlsx.fromCells]]).
  */
object Xls {

  def read(spark: SparkSession, path: String): DataFrame = {
    // same rejection contract as Xlsx.read: corrupt BIFF8/CFB structure
    // (wrong record lengths, truncated sectors, bogus chains) must
    // surface as a clear IllegalArgumentException naming the file, not
    // a raw index error from the record cursor.
    val (header, rows) =
      try parse(path)
      catch {
        case e: IllegalArgumentException => throw e
        case scala.util.control.NonFatal(e) => throw new IllegalArgumentException(
          s"corrupt .xls (CFB/BIFF8) file $path: " +
            s"${e.getClass.getSimpleName}: ${e.getMessage}", e)
      }
    require(header.nonEmpty, s"Empty xls sheet in $path")
    Xlsx.fromCells(spark, header, rows)
  }

  /** True when the file starts with the CFB magic (D0 CF 11 E0 ...) —
    * used by Ingest to route .xls/.xlsx by content, not extension. */
  def isCfb(path: String): Boolean = {
    val in = Files.newInputStream(Paths.get(path))
    try {
      val m = in.readNBytes(8)
      m.length == 8 && (m(0) & 0xFF) == 0xD0 && (m(1) & 0xFF) == 0xCF &&
        (m(2) & 0xFF) == 0x11 && (m(3) & 0xFF) == 0xE0
    } finally in.close()
  }

  // ---- CFB container ---------------------------------------------------

  private final val EndOfChain = 0xFFFFFFFE
  private final val FreeSect = 0xFFFFFFFF

  private[engine] def workbookStream(bytes: Array[Byte]): Array[Byte] = {
    def u16(o: Int): Int = (bytes(o) & 0xFF) | ((bytes(o + 1) & 0xFF) << 8)
    def u32(o: Int): Int = u16(o) | (u16(o + 2) << 16)
    require(bytes.length >= 512 && u32(0) == 0xE011CFD0,
      "not an OLE2/CFB file (legacy .xls expected)")
    val sectorSize = 1 << u16(30)
    val miniSize = 1 << u16(32)
    val firstDir = u32(48)
    val cutoff = u32(56)
    val firstMiniFat = u32(60)
    val firstDifat = u32(68)

    def sector(n: Int): Int = (n + 1) * sectorSize // data offset of sector n

    // FAT sector list: 109 header DIFAT entries + chained DIFAT sectors
    val fatSectors = ArrayBuffer[Int]()
    for (i <- 0 until 109) {
      val e = u32(76 + 4 * i)
      if (e != FreeSect && e != EndOfChain) fatSectors += e
    }
    var ds = firstDifat
    while (ds != EndOfChain && ds != FreeSect) {
      val base = sector(ds)
      for (i <- 0 until sectorSize / 4 - 1) {
        val e = u32(base + 4 * i)
        if (e != FreeSect && e != EndOfChain) fatSectors += e
      }
      ds = u32(base + sectorSize - 4)
    }
    val perSector = sectorSize / 4
    val fat = new Array[Int](fatSectors.length * perSector)
    fatSectors.zipWithIndex.foreach { case (fs, i) =>
      for (j <- 0 until perSector) fat(i * perSector + j) = u32(sector(fs) + 4 * j)
    }

    def chain(start: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      var s = start
      var guard = 0
      while (s != EndOfChain && s != FreeSect && guard < fat.length + 1) {
        out.write(bytes, sector(s), math.min(sectorSize, bytes.length - sector(s)))
        s = fat(s)
        guard += 1
      }
      out.toByteArray
    }

    // directory: 128-byte entries (name UTF-16 + type + start + size)
    val dir = chain(firstDir)
    case class Entry(name: String, objType: Int, start: Int, size: Long)
    val entries = (0 until dir.length / 128).map { i =>
      val o = i * 128
      def du16(off: Int) = (dir(o + off) & 0xFF) | ((dir(o + off + 1) & 0xFF) << 8)
      def du32(off: Int) = du16(off) | (du16(off + 2) << 16)
      val nameLen = math.max(0, du16(64) - 2) // excl. trailing NUL
      val name = new String(dir, o, math.min(nameLen, 64), "UTF-16LE")
      Entry(name, dir(o + 66) & 0xFF, du32(116), du32(120).toLong & 0xFFFFFFFFL)
    }
    val root = entries.find(_.objType == 5).getOrElse(sys.error("CFB: no root entry"))
    val wb = entries.find(e => e.objType == 2 &&
        (e.name.equalsIgnoreCase("Workbook") || e.name.equalsIgnoreCase("Book")))
      .getOrElse(sys.error("CFB: no Workbook stream (not an Excel file?)"))

    val stream =
      if (wb.size >= cutoff) chain(wb.start)
      else {
        // mini stream: 64-byte sectors inside the root entry's chain
        val miniFatBytes = chain(firstMiniFat)
        def mf(n: Int): Int =
          (miniFatBytes(4 * n) & 0xFF) | ((miniFatBytes(4 * n + 1) & 0xFF) << 8) |
            ((miniFatBytes(4 * n + 2) & 0xFF) << 16) | ((miniFatBytes(4 * n + 3) & 0xFF) << 24)
        val mini = chain(root.start)
        val out = new java.io.ByteArrayOutputStream()
        var s = wb.start
        var guard = 0
        while (s != EndOfChain && s != FreeSect && guard < miniFatBytes.length / 4 + 1) {
          out.write(mini, s * miniSize, math.min(miniSize, mini.length - s * miniSize))
          s = mf(s)
          guard += 1
        }
        out.toByteArray
      }
    java.util.Arrays.copyOf(stream, math.min(stream.length, wb.size).toInt)
  }

  // ---- BIFF8 records ---------------------------------------------------

  /** Multi-record cursor: reads little-endian fields across the
    * SST record and its CONTINUE records. `charBoundary` implements the
    * BIFF8 rule that character data resuming in a CONTINUE record starts
    * with a fresh grbit (compressed/utf-16 flag) byte. */
  private final class Cursor(data: Array[Byte], segments: Seq[(Int, Int)]) {
    private var seg = 0
    private var off = 0
    def atSegmentStart: Boolean = off == 0 && seg < segments.length
    def hasMore: Boolean =
      seg < segments.length && (off < segments(seg)._2 || seg < segments.length - 1)
    private def advance(): Unit =
      while (seg < segments.length && off >= segments(seg)._2) { seg += 1; off = 0 }
    def u8(): Int = {
      advance()
      val b = data(segments(seg)._1 + off) & 0xFF
      off += 1
      b
    }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Int = u16() | (u16() << 16)
    def skip(n: Int): Unit = (0 until n).foreach(_ => u8())
    /** Read `cch` characters honoring CONTINUE grbit resets. */
    def chars(cch: Int, highByte0: Boolean): String = {
      val sb = new StringBuilder
      var remaining = cch
      var high = highByte0
      while (remaining > 0) {
        advance()
        // character data resuming at a CONTINUE boundary always begins
        // with a fresh grbit byte — even when zero characters were read
        // before the boundary (header at the end of the previous record)
        if (atSegmentStart && remaining > 0)
          high = (u8() & 1) == 1
        val room = segments(seg)._2 - off
        val charBytes = if (high) 2 else 1
        val n = math.min(remaining, math.max(1, room / charBytes))
        for (_ <- 0 until n)
          sb += (if (high) u16() else u8()).toChar
        remaining -= n
      }
      sb.toString
    }
  }

  /** → (header, data rows) as raw string cells (null = missing). */
  private[engine] def parse(path: String): (Seq[String], Seq[Array[String]]) = {
    val stream = workbookStream(Files.readAllBytes(Paths.get(path)))
    def u16(o: Int): Int = (stream(o) & 0xFF) | ((stream(o + 1) & 0xFF) << 8)
    def u32(o: Int): Int = u16(o) | (u16(o + 2) << 16)
    def f64(o: Int): Double = java.lang.Double.longBitsToDouble(
      (0 until 8).map(i => (stream(o + i) & 0xFFL) << (8 * i)).reduce(_ | _))

    // collect record offsets
    case class Rec(typ: Int, at: Int, len: Int)
    val recs = ArrayBuffer[Rec]()
    var p = 0
    while (p + 4 <= stream.length) {
      val t = u16(p); val l = u16(p + 2)
      if (t == 0 && l == 0) p = stream.length // zero padding after EOF
      else { recs += Rec(t, p + 4, l); p += 4 + l }
    }

    // SST (type 0x00FC) + following CONTINUEs (0x003C) from the globals
    val sst = ArrayBuffer[String]()
    val sstIdx = recs.indexWhere(_.typ == 0x00FC)
    if (sstIdx >= 0) {
      val segs = ArrayBuffer((recs(sstIdx).at, recs(sstIdx).len))
      var j = sstIdx + 1
      while (j < recs.length && recs(j).typ == 0x003C) {
        segs += ((recs(j).at, recs(j).len)); j += 1
      }
      val cur = new Cursor(stream, segs.toSeq)
      cur.skip(4) // total refs
      val unique = cur.u32()
      for (_ <- 0 until unique if cur.hasMore) {
        val cch = cur.u16()
        val grbit = cur.u8()
        val high = (grbit & 1) == 1
        val rich = (grbit & 8) == 8
        val ext = (grbit & 4) == 4
        val cRun = if (rich) cur.u16() else 0
        val cbExt = if (ext) cur.u32() else 0
        sst += cur.chars(cch, high)
        cur.skip(4 * cRun + cbExt)
      }
    }

    def rkValue(rk: Int): String = {
      val mul100 = (rk & 1) == 1
      val isInt = (rk & 2) == 2
      val v =
        if (isInt) (rk >> 2).toDouble
        else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
      num(if (mul100) v / 100.0 else v)
    }

    // cells of the FIRST worksheet substream (records after the second BOF)
    val cells = LinkedHashMap[(Int, Int), String]()
    var maxCol = -1
    def put(r: Int, c: Int, v: String): Unit = {
      cells((r, c)) = v
      if (c > maxCol) maxCol = c
    }
    var bofSeen = 0
    var inSheet = false
    var pendingFormulaCell: Option[(Int, Int)] = None
    recs.foreach { rec =>
      rec.typ match {
        case 0x0809 => bofSeen += 1; inSheet = bofSeen == 2
        case 0x000A => if (inSheet) inSheet = false
        case _ if !inSheet => ()
        case 0x0203 => // NUMBER
          put(u16(rec.at), u16(rec.at + 2), num(f64(rec.at + 6)))
        case 0x027E => // RK
          put(u16(rec.at), u16(rec.at + 2), rkValue(u32(rec.at + 6)))
        case 0x00BD => // MULRK: row, colFirst, (xf, rk)*, colLast
          val row = u16(rec.at); val colFirst = u16(rec.at + 2)
          val n = (rec.len - 6) / 6
          for (i <- 0 until n)
            put(row, colFirst + i, rkValue(u32(rec.at + 4 + 6 * i + 2)))
        case 0x00FD => // LABELSST
          val idx = u32(rec.at + 6)
          put(u16(rec.at), u16(rec.at + 2), if (idx < sst.length) sst(idx) else null)
        case 0x0204 => // LABEL (inline string)
          val cch = u16(rec.at + 6)
          val high = (stream(rec.at + 8) & 1) == 1
          val s =
            if (high) new String(stream, rec.at + 9, 2 * cch, "UTF-16LE")
            else new String(stream, rec.at + 9, cch, "ISO-8859-1")
          put(u16(rec.at), u16(rec.at + 2), s)
        case 0x0205 => // BOOLERR
          if ((stream(rec.at + 7) & 0xFF) == 0) // bool, not error
            put(u16(rec.at), u16(rec.at + 2),
              if ((stream(rec.at + 6) & 0xFF) == 1) "true" else "false")
        case 0x0006 => // FORMULA: cached double, or string in next STRING rec
          val r = u16(rec.at); val c = u16(rec.at + 2)
          if (u16(rec.at + 12) == 0xFFFF) {
            if ((stream(rec.at + 6) & 0xFF) == 0) pendingFormulaCell = Some((r, c))
            else if ((stream(rec.at + 6) & 0xFF) == 2) () // error → null
            else put(r, c, if ((stream(rec.at + 8) & 0xFF) == 1) "true" else "false")
          } else put(r, c, num(f64(rec.at + 6)))
        case 0x0207 => // STRING (formula string result)
          pendingFormulaCell.foreach { case (r, c) =>
            val cch = u16(rec.at)
            val high = (stream(rec.at + 2) & 1) == 1
            val s =
              if (high) new String(stream, rec.at + 3, 2 * cch, "UTF-16LE")
              else new String(stream, rec.at + 3, cch, "ISO-8859-1")
            put(r, c, s)
          }
          pendingFormulaCell = None
        case _ => ()
      }
    }

    if (cells.isEmpty) (Seq.empty, Seq.empty)
    else {
      val maxRow = cells.keys.map(_._1).max
      val grid = (0 to maxRow).map { r =>
        (0 to maxCol).map(c => cells.getOrElse((r, c), null)).toArray
      }
      val header = grid.head.zipWithIndex.map { case (h, i) => if (h == null) s"_c$i" else h }.toSeq
      (header, grid.tail)
    }
  }

  /** Integral doubles render without ".0" so type inference can keep
    * integer columns Long, matching the xlsx path. */
  private def num(d: Double): String =
    if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString else d.toString
}
