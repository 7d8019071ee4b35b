package graft

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{ColumnSpec, MappedImport, Xlsx}

class XlsxSpec extends SparkSpec {

  /** Write a minimal-but-real two-sheet workbook: shared strings, inline
    * strings, numbers, booleans, a sparse row, and out-of-order sheet
    * relationships (rId2 listed first) — the parts a reader must actually
    * resolve rather than assume. */
  private def writeWorkbook(path: String): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(("<?xml version=\"1.0\" encoding=\"UTF-8\"?>" + body).getBytes("UTF-8"))
      zos.closeEntry()
    }
    part("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    // refunds listed FIRST but bound to sheet2.xml via rels
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |  xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |  <sheets>
        |    <sheet name="refunds" sheetId="1" r:id="rId2"/>
        |    <sheet name="sales" sheetId="2" r:id="rId1"/>
        |  </sheets>
        |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId2" Type="w" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5">
        |  <si><t>id</t></si><si><t>region</t></si><si><t>amount</t></si>
        |  <si><t>EMEA</t></si><si><t>APAC</t></si>
        |</sst>""".stripMargin)
    // sales: header from shared strings; row 3 is sparse (no B3); D column bool
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
        |      <c r="C1" t="s"><v>2</v></c><c r="D1" t="inlineStr"><is><t>flagged</t></is></c>
        |    </row>
        |    <row r="2">
        |      <c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c>
        |      <c r="C2"><v>10.5</v></c><c r="D2" t="b"><v>1</v></c>
        |    </row>
        |    <row r="3">
        |      <c r="A3"><v>2</v></c><c r="C3"><v>20</v></c><c r="D3" t="b"><v>0</v></c>
        |    </row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    part("xl/worksheets/sheet2.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1"><c r="A1" t="inlineStr"><is><t>id</t></is></c><c r="B1" t="inlineStr"><is><t>region</t></is></c></row>
        |    <row r="2"><c r="A2"><v>9</v></c><c r="B2" t="s"><v>4</v></c></row>
        |  </sheetData>
        |</worksheet>""".stripMargin)
    zos.close()
  }

  test("xlsx workbook: list sheets, read sheet, map-import downstream") {
    val wb = Files.createTempDirectory("xlsx").toString + "/book.xlsx"
    writeWorkbook(wb)
    assert(Xlsx.listSheets(wb) == Seq("refunds", "sales"))

    val sales = Xlsx.readSheet(spark, wb, "sales")
    assert(sales.columns.toSeq == Seq("id", "region", "amount", "flagged"))
    val rows = sales.collect().map(r => (0 until 4).map(r.getString)).toSeq
    assert(rows == Seq(
      Seq("1", "EMEA", "10.5", "true"),
      Seq("2", null, "20", "false"))) // sparse B3 surfaces as null

    // relationship indirection: "refunds" (listed first) must bind to sheet2
    val refunds = Xlsx.readSheet(spark, wb, "refunds")
    assert(refunds.collect().map(_.getString(1)).toSeq == Seq("APAC"))

    // downstream is the ordinary import pipeline
    val mapped = MappedImport(sales, Seq(
      ColumnSpec("id", "sale_id", castTo = Some("bigint")),
      ColumnSpec("amount", "amount", castTo = Some("double"))))
    assert(mapped.agg(org.apache.spark.sql.functions.sum("amount")).head().getDouble(0) == 30.5)
  }

  test("colIndex decodes multi-letter columns") {
    assert(Xlsx.colIndex("A1") == 0 && Xlsx.colIndex("Z9") == 25 &&
      Xlsx.colIndex("AA3") == 26 && Xlsx.colIndex("BC23") == 54)
  }

  test("missing sheet and missing part fail loudly") {
    val wb = Files.createTempDirectory("xlsx2").toString + "/book.xlsx"
    writeWorkbook(wb)
    val e = intercept[IllegalArgumentException](Xlsx.readRows(wb, "nope"))
    assert(e.getMessage.contains("no sheet"))
  }
}
