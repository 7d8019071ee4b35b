package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Format-sniffing front door for spreadsheet imports — the analog of
  * the reference's `*.xlsx *.xls *.xlsm` file filter
  * (SQL_DATA_INTEGRATION_TOOL.py:557, :784): the user hands over
  * whatever file they have; the CONTENT decides the codec, never the
  * extension (real-world files are routinely misnamed). Zip magic
  * (PK\x03\x04) routes to [[Xlsx]] — which is also the `.xlsm` path:
  * a macro-enabled workbook is the same OOXML zip with an extra
  * vbaProject part the reader never touches — and the CFB signature
  * routes to [[Xls]] (BIFF8). Anything else is rejected loudly with
  * what was actually seen. */
object Workbooks {

  private def sniff(path: String): String = {
    val head = new Array[Byte](8)
    val in = new java.io.FileInputStream(path)
    val n = try in.read(head) finally in.close()
    if (n >= 4 && head(0) == 'P' && head(1) == 'K' && head(2) == 3 && head(3) == 4) "ooxml"
    else if (Cfb.isCfb(java.util.Arrays.copyOf(head, math.max(n, 0)))) "cfb"
    else throw new IllegalArgumentException(
      s"$path is neither a zip-based workbook (.xlsx/.xlsm) nor a compound-file " +
        s".xls — first bytes: ${head.take(math.max(n, 0)).map("%02x".format(_)).mkString(" ")}")
  }

  def listSheets(path: String): Seq[String] =
    if (sniff(path) == "ooxml") Xlsx.listSheets(path) else Xls.listSheets(path)

  def readSheet(spark: SparkSession, path: String, sheet: String): DataFrame =
    if (sniff(path) == "ooxml") Xlsx.readSheet(spark, path, sheet)
    else Xls.readSheet(spark, path, sheet)
}
