package graft.sources

import java.io.InputStream
import java.util.zip.ZipFile

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.w3c.dom.Element

/** Native xlsx (Office Open XML) workbook reader — no external
  * dependencies: an .xlsx file is a zip of XML parts, and the JDK ships
  * both the zip codec and a DOM parser. Mirrors the reference's openpyxl
  * usage (SQL_DATA_INTEGRATION_TOOL.py:555-577: open workbook, list sheet
  * names, read a chosen sheet into rows, first row = headers).
  *
  * Deliberately DRIVER-SIDE, like the reference: workbooks are import-
  * scale artifacts (humans mail them), not data-lake tables — the result
  * lands in a DataFrame and from there the pipeline is the usual
  * MappedImport → appendTo. Anything 100 TB-sized arrives as
  * parquet/csv/json and never goes near this code path.
  *
  * Covers the parts real-world writers emit: sharedStrings (t="s"),
  * inline strings (t="inlineStr"/"str"), numbers (no t), booleans
  * (t="b"), sparse rows (cells carry their "A1"-style address), and
  * workbook→worksheet relationship resolution (sheet order in
  * workbook.xml is NOT part order in the zip).
  */
object Xlsx {

  /** Sheet names, in workbook order. */
  def listSheets(path: String): Seq[String] = withZip(path) { zip =>
    val wb = parse(zip, "xl/workbook.xml")
    elements(wb, "sheet").map(_.getAttribute("name"))
  }

  /** One sheet as a DataFrame of strings; first row = column names (the
    * reference's header convention). Cast/rename downstream via
    * MappedImport, same as every other source. */
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
  def readRows(path: String, sheet: String): Seq[Array[String]] = withZip(path) { zip =>
    val wb = parse(zip, "xl/workbook.xml")
    val sheets = elements(wb, "sheet")
    val target = sheets.find(_.getAttribute("name") == sheet)
      .getOrElse(throw new IllegalArgumentException(
        s"no sheet '$sheet' in $path (have: ${sheets.map(_.getAttribute("name")).mkString(", ")})"))
    val rid = Option(target.getAttribute("r:id")).filter(_.nonEmpty)
      .getOrElse(target.getAttribute("id")) // some writers emit unprefixed
    val rels = parse(zip, "xl/_rels/workbook.xml.rels")
    val part = elements(rels, "Relationship")
      .find(_.getAttribute("Id") == rid)
      .map(_.getAttribute("Target"))
      .getOrElse(throw new IllegalStateException(s"unresolved sheet relationship $rid"))
    val sheetPath = if (part.startsWith("/")) part.drop(1) else "xl/" + part
    val shared: IndexedSeq[String] =
      if (zip.getEntry("xl/sharedStrings.xml") == null) IndexedSeq.empty
      else elements(parse(zip, "xl/sharedStrings.xml"), "si").map(_.getTextContent).toIndexedSeq
    val doc = parse(zip, sheetPath)
    elements(doc, "row").map { row =>
      val cells = mutable.ArrayBuffer.empty[String]
      elements(row, "c").foreach { c =>
        val idx = colIndex(c.getAttribute("r"))
        while (cells.size <= idx) cells += null
        val vNode = elements(c, "v").headOption.map(_.getTextContent)
          .orElse(elements(c, "is").headOption.map(_.getTextContent))
        cells(idx) = c.getAttribute("t") match {
          case "s" => vNode.map(v => shared(v.trim.toInt)).orNull
          case "b" => vNode.map(v => if (v.trim == "1") "true" else "false").orNull
          case _ => vNode.orNull // inlineStr/str/number: text as written
        }
      }
      cells.toArray
    }
  }

  /** 0-based column index from an "BC23"-style cell address. */
  private[graft] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(_.isLetter)
    require(letters.nonEmpty, s"cell address '$ref' has no column letters")
    letters.foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1
  }

  private def withZip[A](path: String)(f: ZipFile => A): A = {
    val zip = new ZipFile(path)
    try f(zip) finally zip.close()
  }

  private def parse(zip: ZipFile, entry: String): Element = {
    val e = zip.getEntry(entry)
    require(e != null, s"missing xlsx part: $entry")
    val in: InputStream = zip.getInputStream(e)
    try {
      val fac = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      fac.setNamespaceAware(false)
      // workbooks come from outside: no DTDs, no external entities
      fac.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      fac.newDocumentBuilder().parse(in).getDocumentElement
    } finally in.close()
  }

  /** Descendant elements by local tag name (namespace-prefix tolerant). */
  private def elements(root: Element, tag: String): Seq[Element] = {
    val out = mutable.ArrayBuffer.empty[Element]
    def walk(e: org.w3c.dom.Node): Unit = {
      var c = e.getFirstChild
      while (c != null) {
        c match {
          case el: Element =>
            val n = el.getTagName
            if (n == tag || n.endsWith(":" + tag)) out += el
            walk(el)
          case _ =>
        }
        c = c.getNextSibling
      }
    }
    walk(root)
    out.toSeq
  }
}
