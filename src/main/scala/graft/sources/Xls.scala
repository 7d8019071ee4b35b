package graft.sources

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native legacy `.xls` (BIFF8) workbook reader — the binary sibling of
  * [[Xlsx]], implemented from the public [MS-XLS] specification with no
  * external dependencies. The reference's import dialogs accept
  * `*.xlsx *.xls *.xlsm` (SQL_DATA_INTEGRATION_TOOL.py:557, :784);
  * until r11 this engine read only the zip-based formats, and old
  * finance/ops exports are exactly the files an import tool receives.
  *
  * Same deliberate scope as [[Xlsx]]: DRIVER-SIDE, import-scale
  * artifacts only; the result is a DataFrame of strings (header row =
  * column names) handed to the ordinary MappedImport pipeline.
  *
  * Covers the records real-world BIFF8 writers emit: BOUNDSHEET sheet
  * registry, the shared string table including CONTINUE-split strings
  * with per-fragment encoding switches and rich-text/phonetic payload
  * skipping, LABELSST / LABEL / NUMBER / RK / MULRK / BOOLERR cells,
  * and FORMULA cached results (numeric, boolean, and string via the
  * trailing STRING record). BIFF5/95 workbooks (stream "Book", no
  * SST) are REJECTED loudly with a re-save hint rather than misread.
  * Number cells render like the grid shows them: integral values
  * without a trailing ".0", everything else Double.toString. Date
  * number formats are not interpreted — a date cell surfaces as its
  * serial number (stated, the same contract as a CSV export of the
  * sheet).
  */
object Xls {

  /** Sheet names, in workbook (BOUNDSHEET) order. */
  def listSheets(path: String): Seq[String] =
    globals(workbookStream(path))._1.map(_._2)

  /** One sheet as a DataFrame of strings; first row = column names —
    * the [[Xlsx.readSheet]] contract exactly. */
  def readSheet(spark: SparkSession, path: String, sheet: String): DataFrame = {
    val rows = readRows(path, sheet)
    require(rows.nonEmpty, s"sheet '$sheet' in $path is empty")
    val header = rows.head.map(h => if (h == null || h.isEmpty) "_c" else h)
    val width = header.length
    val data = rows.tail.map(r => r.padTo(width, null).take(width))
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(
      header.map(org.apache.spark.sql.types.StructField(_,
        org.apache.spark.sql.types.StringType, nullable = true)))
    spark.createDataFrame(
      data.map(org.apache.spark.sql.Row.fromSeq(_)).toList.asJava, schema)
  }

  /** Raw cell grid of one sheet (dense, row-major, nulls for gaps). */
  def readRows(path: String, sheet: String): Seq[Array[String]] = {
    val wb = workbookStream(path)
    val (sheets, sst) = globals(wb)
    val pos = sheets.find(_._2 == sheet).map(_._1)
      .getOrElse(throw new IllegalArgumentException(
        s"no sheet '$sheet' in $path (have: ${sheets.map(_._2).mkString(", ")})"))
    val cells = mutable.Map.empty[(Int, Int), String]
    var maxRow = -1
    var maxCol = -1
    def put(r: Int, c: Int, v: String): Unit = {
      cells((r, c)) = v
      if (r > maxRow) maxRow = r
      if (c > maxCol) maxCol = c
    }
    val it = new RecordIter(wb, pos)
    require(it.hasNext && it.peekId == 0x0809, s"sheet '$sheet': no BOF at substream start")
    var lastFormula: Option[(Int, Int)] = None // cell awaiting a STRING result
    var done = false
    while (it.hasNext && !done) {
      val (id, d) = it.next()
      id match {
        case 0x000A => done = true // EOF: end of this sheet substream
        case 0x00FD => // LABELSST
          put(u16(d, 0), u16(d, 2), sst(u32(d, 6)))
        case 0x0204 => // LABEL: inline XLUnicodeString
          put(u16(d, 0), u16(d, 2), inlineString(d, 6))
        case 0x0203 => // NUMBER: IEEE double
          put(u16(d, 0), u16(d, 2), fmtNum(java.lang.Double.longBitsToDouble(u64(d, 6))))
        case 0x027E => // RK
          put(u16(d, 0), u16(d, 2), fmtNum(rkValue(u32(d, 6))))
        case 0x00BD => // MULRK: colFirst..colLast of (ixfe, rk)
          val r = u16(d, 0); val c0 = u16(d, 2)
          val n = (d.length - 6) / 6
          (0 until n).foreach(i => put(r, c0 + i, fmtNum(rkValue(u32(d, 4 + 6 * i + 2)))))
        case 0x0205 => // BOOLERR
          val r = u16(d, 0); val c = u16(d, 2)
          if ((d(7) & 0xff) == 0) put(r, c, if ((d(6) & 0xff) == 1) "true" else "false")
          else put(r, c, null) // error cell: no value, like an empty xlsx cell
        case 0x0006 => // FORMULA: cached result
          val r = u16(d, 0); val c = u16(d, 2)
          lastFormula = None
          if (u16(d, 12) == 0xFFFF) (d(6) & 0xff) match {
            case 0 => lastFormula = Some((r, c)) // string: value in next STRING
            case 1 => put(r, c, if ((d(8) & 0xff) == 1) "true" else "false")
            case 3 => put(r, c, "")
            case _ => put(r, c, null) // error result
          } else put(r, c, fmtNum(java.lang.Double.longBitsToDouble(u64(d, 6))))
        case 0x0207 => // STRING: cached string result of the last FORMULA
          lastFormula.foreach { case (r, c) => put(r, c, inlineString(d, 0)) }
          lastFormula = None
        case _ => // DIMENSIONS, ROW, formats, ... — not cell values
      }
    }
    (0 to maxRow).map { r =>
      (0 to maxCol).map(c => cells.getOrElse((r, c), null)).toArray
    }
  }

  // ---------------- workbook globals ----------------

  /** The BIFF8 "Workbook" stream; BIFF5 ("Book") rejected loudly. */
  private def workbookStream(path: String): Array[Byte] = {
    val cfb = Cfb.open(path)
    val names = cfb.streamNames
    if (names.contains("Workbook")) cfb.stream("Workbook")
    else if (names.contains("Book"))
      throw new IllegalArgumentException(
        s"$path is an Excel 5.0/95 (BIFF5) workbook — not supported; " +
          "re-save it as Excel 97-2003 (.xls/BIFF8) or .xlsx")
    else throw new IllegalArgumentException(
      s"$path has no Workbook stream (streams: ${names.mkString(", ")}) — not an Excel file")
  }

  /** Parse the globals substream: (lbPlyPos, name) per worksheet (chart
    * and macro sheets excluded) + the shared string table. */
  private def globals(wb: Array[Byte]): (Seq[(Int, String)], IndexedSeq[String]) = {
    val sheets = mutable.ArrayBuffer.empty[(Int, String)]
    var sst: IndexedSeq[String] = IndexedSeq.empty
    val it = new RecordIter(wb, 0)
    require(it.hasNext && it.peekId == 0x0809, "no BOF record — not a BIFF8 stream")
    var done = false
    while (it.hasNext && !done) {
      val (id, d) = it.next()
      id match {
        case 0x000A => done = true // EOF of the globals substream
        case 0x0085 => // BOUNDSHEET
          val pos = u32(d, 0)
          val visible = (d(4) & 0x03) == 0
          val isWorksheet = (d(5) & 0xff) == 0
          val cch = d(6) & 0xff
          val wide = (d(7) & 0x01) == 1
          val name = if (wide) new String(d, 8, 2 * cch, "UTF-16LE")
            else new String(d, 8, cch, "ISO-8859-1")
          val _ = visible // hidden sheets still listed, like openpyxl
          if (isWorksheet) sheets += ((pos, name))
        case 0x00FC => // SST (+ its CONTINUE records)
          val chunks = mutable.ArrayBuffer(d)
          while (it.hasNext && it.peekId == 0x003C) chunks += it.next()._2
          sst = parseSst(chunks.toIndexedSeq)
        case _ =>
      }
    }
    (sheets.toSeq, sst)
  }

  /** XLUnicodeRichExtendedString array spanning SST + CONTINUE records.
    * A split inside the CHARACTER ARRAY re-states the encoding with a
    * fresh option byte at the continuation start (the fragment widths
    * may differ); splits inside rich-run / phonetic payloads do not. */
  private def parseSst(chunks: IndexedSeq[Array[Byte]]): IndexedSeq[String] = {
    val cur = new Cursor(chunks)
    cur.skipRaw(4) // cstTotal
    val unique = cur.u32()
    (0 until unique).map { _ =>
      val cch = cur.u16()
      val grbit = cur.u8()
      val rich = (grbit & 0x08) != 0
      val ext = (grbit & 0x04) != 0
      val cRun = if (rich) cur.u16() else 0
      val cbExt = if (ext) cur.u32() else 0
      val s = cur.readChars(cch, (grbit & 0x01) != 0)
      cur.skipRaw(4 * cRun + cbExt)
      s
    }
  }

  /** XLUnicodeString embedded in a single record (LABEL, STRING). */
  private def inlineString(d: Array[Byte], off: Int): String = {
    val cch = u16(d, off)
    if ((d(off + 2) & 0x01) == 1) new String(d, off + 3, 2 * cch, "UTF-16LE")
    else new String(d, off + 3, cch, "ISO-8859-1")
  }

  // ---------------- primitives ----------------

  /** Record walker over a BIFF stream from a byte offset. */
  private final class RecordIter(b: Array[Byte], start: Int) {
    private var off = start
    def hasNext: Boolean = off + 4 <= b.length
    def peekId: Int = u16(b, off)
    def next(): (Int, Array[Byte]) = {
      val id = u16(b, off)
      val len = u16(b, off + 2)
      require(off + 4 + len <= b.length, s"truncated BIFF record 0x${id.toHexString} at $off")
      val d = java.util.Arrays.copyOfRange(b, off + 4, off + 4 + len)
      off += 4 + len
      (id, d)
    }
  }

  /** Multi-chunk reader for CONTINUE-split SST payloads. */
  private final class Cursor(chunks: IndexedSeq[Array[Byte]]) {
    private var ci = 0
    private var off = 0
    private def ensure(): Unit = {
      while (ci < chunks.length && off >= chunks(ci).length) { ci += 1; off = 0 }
      require(ci < chunks.length, "SST ran past its CONTINUE records")
    }
    def u8(): Int = { ensure(); val v = chunks(ci)(off) & 0xff; off += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def u32(): Int = u16() | (u16() << 16)
    /** Skip payload bytes that carry NO option byte at a record split. */
    def skipRaw(n: Int): Unit = {
      var left = n
      while (left > 0) {
        ensure()
        val take = math.min(left, chunks(ci).length - off)
        off += take
        left -= take
      }
    }
    /** Read cch characters; every advance to a new record inside the
      * character array consumes a fresh option byte restating the
      * fragment's width (fragments of one string may differ). */
    def readChars(cch: Int, wideAtStart: Boolean): String = {
      val sb = new java.lang.StringBuilder(cch)
      var wide = wideAtStart
      var left = cch
      while (left > 0) {
        if (off >= chunks(ci).length) { // continuation fragment
          ci += 1; off = 0
          require(ci < chunks.length, "SST ran past its CONTINUE records")
          wide = (u8() & 0x01) == 1
        }
        val avail = chunks(ci).length - off
        val charBytes = if (wide) 2 else 1
        val take = math.min(left, avail / charBytes)
        require(take > 0 || avail == 0,
          s"split mid-character in SST (avail=$avail wide=$wide)")
        sb.append(new String(chunks(ci), off, take * charBytes,
          if (wide) "UTF-16LE" else "ISO-8859-1"))
        off += take * charBytes
        left -= take
      }
      sb.toString
    }
  }

  /** RK number: 30-bit payload + fX100/fInt flags. */
  private[graft] def rkValue(rk: Int): Double = {
    val x100 = (rk & 0x01) != 0
    val v = if ((rk & 0x02) != 0) (rk >> 2).toDouble
      else java.lang.Double.longBitsToDouble((rk & 0xFFFFFFFCL) << 32)
    if (x100) v / 100.0 else v
  }

  /** Grid-style rendering: integral doubles without ".0". */
  private[graft] def fmtNum(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else v.toString

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Int =
    u16(b, off) | (u16(b, off + 2) << 16)
  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off).toLong & 0xFFFFFFFFL) | ((u32(b, off + 4).toLong & 0xFFFFFFFFL) << 32)
}
