package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's multi-sheet Excel workflow (SQL_DATA_INTEGRATION_TOOL.py:
  * 555-577 — pick a workbook, list sheet names, load a sheet) mapped to the
  * lakehouse: a "workbook" is a directory, a "sheet" is a CSV/JSON file in
  * it. Excel itself needs no special handling at scale — the spreadsheet is
  * exported/landed as CSV, and from there the import pipeline is identical:
  * listSheets → loadSheet → MappedImport → appendTo.
  */
object SpreadsheetDir {

  /** Sheet names = data files in the workbook directory. */
  def listSheets(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(n => n.endsWith(".csv") || n.endsWith(".json"))
      .sorted
  }

  /** Load one sheet; format follows the extension. */
  def loadSheet(spark: SparkSession, dir: String, sheet: String): DataFrame = {
    val fmt = if (sheet.endsWith(".json")) "json" else "csv"
    Tables.loadFormat(spark, s"$dir/$sheet", fmt)
  }
}
