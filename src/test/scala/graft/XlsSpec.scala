package graft

import java.nio.file.Files

import graft.sources.{ColumnSpec, MappedImport, Workbooks, Xls}

/** Exercises the native BIFF8 reader against a workbook BUILT BYTE-BY-
  * BYTE from the [MS-CFB]/[MS-XLS] specs (no xls writer exists in this
  * environment): CFB mini-stream layout, the SST split across a
  * CONTINUE record with an encoding switch, rich-text payload skipping,
  * all RK flavors, MULRK, LABEL/LABELSST, BOOLERR, and FORMULA cached
  * results — plus the BIFF5 loud rejection and the format-sniffing
  * Workbooks dispatcher (.xlsm routes to the zip reader). */
class XlsSpec extends SparkSpec {

  // ---------------- byte-building helpers ----------------

  private def u16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def u32(v: Int): Array[Byte] = u16(v & 0xffff) ++ u16((v >>> 16) & 0xffff)
  private def dbl(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    (0 until 8).map(i => ((bits >> (8 * i)) & 0xff).toByte).toArray
  }
  private def rec(id: Int, data: Array[Byte]): Array[Byte] =
    u16(id) ++ u16(data.length) ++ data
  private def latin1(s: String) = s.getBytes("ISO-8859-1")
  private def wide(s: String) = s.getBytes("UTF-16LE")

  /** Minimal CFB container: header + 1 FAT sector + 1 directory sector +
    * 1 miniFAT sector + the mini stream — the layout Excel itself uses
    * for small workbooks (stream < 4096 ⇒ mini stream). */
  private def writeCfb(path: String, streamName: String, stream: Array[Byte]): Unit = {
    require(stream.length < 4096, "fixture writer only does the mini-stream layout")
    val nMini = (stream.length + 63) / 64
    val miniLen = nMini * 64
    val nMs = (miniLen + 511) / 512
    val free = 0xFFFFFFFF
    val eoc = 0xFFFFFFFE

    val header = new java.io.ByteArrayOutputStream()
    header.write(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1).map(_.toByte))
    header.write(new Array[Byte](16)) // CLSID
    header.write(u16(0x003E)); header.write(u16(0x0003)) // minor/major
    header.write(u16(0xFFFE)) // little-endian
    header.write(u16(9)); header.write(u16(6)) // sector/mini shifts
    header.write(new Array[Byte](6)) // reserved
    header.write(u32(0)) // # dir sectors (v3: 0)
    header.write(u32(1)) // # FAT sectors
    header.write(u32(1)) // first directory sector
    header.write(u32(0)) // transaction
    header.write(u32(4096)) // mini cutoff
    header.write(u32(2)); header.write(u32(1)) // first miniFAT, # miniFAT
    header.write(u32(eoc)); header.write(u32(0)) // first DIFAT, # DIFAT
    header.write(u32(0)) // DIFAT[0] -> FAT at sector 0
    (1 until 109).foreach(_ => header.write(u32(free)))

    def sector(fill: Array[Byte]): Array[Byte] = {
      val s = new Array[Byte](512)
      System.arraycopy(fill, 0, s, 0, fill.length)
      s
    }
    val fat = new java.io.ByteArrayOutputStream()
    fat.write(u32(0xFFFFFFFD)) // sector 0: FATSECT marker
    fat.write(u32(eoc)) // 1: directory (single)
    fat.write(u32(eoc)) // 2: miniFAT (single)
    (0 until nMs).foreach(i => fat.write(u32(if (i == nMs - 1) eoc else 3 + i + 1)))
    (3 + nMs until 128).foreach(_ => fat.write(u32(free)))

    def dirEntry(name: String, tpe: Int, child: Int, start: Int, size: Int): Array[Byte] = {
      val e = new Array[Byte](128)
      val nm = wide(name)
      System.arraycopy(nm, 0, e, 0, nm.length)
      System.arraycopy(u16(nm.length + 2), 0, e, 0x40, 2)
      e(0x42) = tpe.toByte; e(0x43) = 1
      System.arraycopy(u32(-1), 0, e, 0x44, 4) // left
      System.arraycopy(u32(-1), 0, e, 0x48, 4) // right
      System.arraycopy(u32(child), 0, e, 0x4C, 4)
      System.arraycopy(u32(start), 0, e, 0x74, 4)
      System.arraycopy(u32(size), 0, e, 0x78, 4)
      e
    }
    val dir = dirEntry("Root Entry", 5, 1, 3, miniLen) ++
      dirEntry(streamName, 2, -1, 0, stream.length) ++
      new Array[Byte](256)

    val miniFat = new java.io.ByteArrayOutputStream()
    (0 until nMini).foreach(i => miniFat.write(u32(if (i == nMini - 1) eoc else i + 1)))
    (nMini until 128).foreach(_ => miniFat.write(u32(free)))

    val out = new java.io.FileOutputStream(path)
    try {
      out.write(header.toByteArray) // 512 bytes exactly
      out.write(sector(fat.toByteArray))
      out.write(sector(dir))
      out.write(sector(miniFat.toByteArray))
      val ms = java.util.Arrays.copyOf(stream, nMs * 512)
      out.write(ms)
    } finally out.close()
  }

  // ---------------- BIFF8 workbook fixture ----------------

  private def bof(dt: Int): Array[Byte] =
    rec(0x0809, u16(0x0600) ++ u16(dt) ++ u16(0x0DBB) ++ u16(0x07CC) ++ u32(0) ++ u32(0))

  private def labelSst(r: Int, c: Int, isst: Int) =
    rec(0x00FD, u16(r) ++ u16(c) ++ u16(0) ++ u32(isst))
  private def label(r: Int, c: Int, s: String) =
    rec(0x0204, u16(r) ++ u16(c) ++ u16(0) ++ u16(s.length) ++ Array(0.toByte) ++ latin1(s))
  private def number(r: Int, c: Int, v: Double) =
    rec(0x0203, u16(r) ++ u16(c) ++ u16(0) ++ dbl(v))
  private def rkInt(v: Int, x100: Boolean = false): Int = (v << 2) | (if (x100) 3 else 2)
  private def rk(r: Int, c: Int, rkv: Int) =
    rec(0x027E, u16(r) ++ u16(c) ++ u16(0) ++ u32(rkv))
  private def boolErr(r: Int, c: Int, b: Boolean) =
    rec(0x0205, u16(r) ++ u16(c) ++ u16(0) ++ Array[Byte](if (b) 1 else 0, 0))

  private def buildWorkbookStream(): Array[Byte] = {
    // sheet substreams first; globals needs their offsets
    val sales = bof(0x0010) ++
      label(0, 0, "id") ++ labelSst(0, 1, 0) ++ labelSst(0, 2, 1) ++
      labelSst(0, 3, 2) ++ label(0, 4, "calc") ++
      rk(1, 0, rkInt(1)) ++ labelSst(1, 1, 3) ++ number(1, 2, 10.5) ++
      boolErr(1, 3, b = true) ++
      rec(0x0006, u16(1) ++ u16(4) ++ u16(0) ++ dbl(99.0) ++ u16(0) ++ u32(0) ++ u16(0)) ++
      rk(2, 0, rkInt(2)) ++ labelSst(2, 1, 4) ++ rk(2, 2, rkInt(1234, x100 = true)) ++
      boolErr(2, 3, b = false) ++
      rec(0x0006, u16(2) ++ u16(4) ++ u16(0) ++
        (Array[Byte](1, 0, 1, 0, 0, 0) ++ u16(0xFFFF)) ++ u16(0) ++ u32(0) ++ u16(0)) ++
      rk(3, 0, 0x40040000) ++ // RK-encoded IEEE 2.5
      rec(0x00BD, u16(3) ++ u16(2) ++ // MULRK C4:D4 = 7, 8
        u16(0) ++ u32(rkInt(7)) ++ u16(0) ++ u32(rkInt(8)) ++ u16(3)) ++
      rec(0x0006, u16(3) ++ u16(4) ++ u16(0) ++
        (Array[Byte](0, 0, 0, 0, 0, 0) ++ u16(0xFFFF)) ++ u16(0) ++ u32(0) ++ u16(0)) ++
      rec(0x0207, u16(4) ++ Array(0.toByte) ++ latin1("done")) ++ // STRING result
      rec(0x000A, Array.emptyByteArray)
    val refunds = bof(0x0010) ++ label(0, 0, "x") ++ rec(0x000A, Array.emptyByteArray)

    def sstString(s: String) = u16(s.length) ++ Array(0.toByte) ++ latin1(s)
    // "EMEA" carries one rich-text run (skipped payload after the chars)
    val rich = u16(4) ++ Array(0x08.toByte) ++ u16(1) ++ latin1("EMEA") ++ u32(0)
    // "PåcificX": wide fragment "Påc" in SST, rest continues COMPRESSED
    val splitHead = u16(8) ++ Array(0x01.toByte) ++ wide("Påc")
    val sst = rec(0x00FC,
      u32(6) ++ u32(5) ++ sstString("region") ++ sstString("amount") ++
        sstString("flagged") ++ rich ++ splitHead) ++
      rec(0x003C, Array(0x00.toByte) ++ latin1("ificX"))

    def boundsheet(pos: Int, name: String) =
      rec(0x0085, u32(pos) ++ u16(0) ++ Array(name.length.toByte, 0.toByte) ++ latin1(name))
    // globals length is position-independent here (fixed-size records)
    val globalsLen = bof(0x0005).length +
      boundsheet(0, "sales").length + boundsheet(0, "refunds").length +
      sst.length + rec(0x000A, Array.emptyByteArray).length
    bof(0x0005) ++
      boundsheet(globalsLen, "sales") ++
      boundsheet(globalsLen + sales.length, "refunds") ++
      sst ++ rec(0x000A, Array.emptyByteArray) ++
      sales ++ refunds
  }

  test("BIFF8 .xls: sheets, SST continue-split, RK/MULRK/FORMULA cells, import") {
    val dir = Files.createTempDirectory("xls").toString
    val path = s"$dir/book.xls"
    writeCfb(path, "Workbook", buildWorkbookStream())

    assert(Xls.listSheets(path) == Seq("sales", "refunds"))
    val sales = Xls.readSheet(spark, path, "sales")
    assert(sales.columns.toSeq == Seq("id", "region", "amount", "flagged", "calc"))
    val rows = sales.collect().map(r => (0 until 5).map(r.getString)).toSeq
    assert(rows == Seq(
      Seq("1", "EMEA", "10.5", "true", "99"),
      Seq("2", "PåcificX", "12.34", "false", "true"),
      Seq("2.5", null, "7", "8", "done")))

    // dispatcher sniffs CFB magic regardless of what the file is called
    assert(Workbooks.listSheets(path) == Seq("sales", "refunds"))
    assert(Workbooks.readSheet(spark, path, "refunds").columns.toSeq == Seq("x"))

    // downstream is the ordinary import pipeline, same as Xlsx
    val mapped = MappedImport(sales, Seq(
      ColumnSpec("id", "sale_id", castTo = Some("double")),
      ColumnSpec("amount", "amount", castTo = Some("double"))))
    assert(mapped.agg(org.apache.spark.sql.functions.sum("amount")).head().getDouble(0) == 29.84)
  }

  test("BIFF5 and non-workbook files are rejected loudly; .xlsm routes to the zip reader") {
    val dir = Files.createTempDirectory("xls2").toString
    // BIFF5 container: stream named "Book"
    val b5 = s"$dir/old.xls"
    writeCfb(b5, "Book", bof(0x0005) ++ rec(0x000A, Array.emptyByteArray))
    val e = intercept[IllegalArgumentException](Xls.listSheets(b5))
    assert(e.getMessage.contains("BIFF5") && e.getMessage.contains("re-save"))

    // not a workbook at all
    val junk = s"$dir/junk.xls"
    Files.write(java.nio.file.Paths.get(junk), "plain,csv,text\n1,2,3\n".getBytes)
    val e2 = intercept[IllegalArgumentException](Workbooks.listSheets(junk))
    assert(e2.getMessage.contains("first bytes"))

    // .xlsm is the same OOXML zip: the dispatcher must route it to Xlsx
    val xlsm = s"$dir/macro.xlsm"
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(xlsm))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" + body).getBytes("UTF-8"))
      zos.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook><sheets><sheet name="m1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/worksheets/sheet1.xml",
      """<worksheet><sheetData>
        |<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c></row>
        |<row r="2"><c r="A2"><v>5</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    part("xl/vbaProject.bin", "<not-xml/>") // present but never parsed
    zos.close()
    assert(Workbooks.listSheets(xlsm) == Seq("m1"))
    assert(Workbooks.readSheet(spark, xlsm, "m1").collect().map(_.getString(0)).toSeq == Seq("5"))
  }

  test("RK decode: int, int/100, and truncated-double flavors") {
    assert(Xls.rkValue((42 << 2) | 2) == 42.0)
    assert(Xls.rkValue((1234 << 2) | 3) == 12.34)
    assert(Xls.rkValue(0x40040000) == 2.5)
    assert(Xls.rkValue((-5 << 2) | 2) == -5.0)
    assert(Xls.fmtNum(3.0) == "3" && Xls.fmtNum(10.5) == "10.5")
  }
}
