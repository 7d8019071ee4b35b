package graft.examples

import java.nio.file.{Files, Paths}
import graft.GraftSession
import graft.sources.{ColumnSpec, MappedImport, SpreadsheetDir}

/** The reference's Data Import workflow end-to-end on the lakehouse layout:
  * a "workbook" directory of CSV/JSON sheets → list sheets → load one →
  * column-map (subset/rename/cast) → append into a parquet target table →
  * read it back.
  *
  * Run: sbt "runMain graft.examples.ImportDemo"
  */
object ImportDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[4]", 4)
    val wb = graft.Scratch.dir("workbook").toString
    Files.write(Paths.get(s"$wb/sales.csv"),
      "id,region,amount,internal_note\n1,EMEA,10.50,x\n2,APAC,20.00,y\n3,,15.25,z\n".getBytes)
    Files.write(Paths.get(s"$wb/refunds.json"),
      """{"id": 9, "region": "EMEA", "amount": -3.5}""".getBytes)

    println("SHEETS: " + SpreadsheetDir.listSheets(spark, wb).mkString(", "))

    val mapped = MappedImport(SpreadsheetDir.loadSheet(spark, wb, "sales.csv"), Seq(
      ColumnSpec("id", "sale_id", castTo = Some("bigint")),
      ColumnSpec("region", "region"),                       // unmapped internal_note is dropped
      ColumnSpec("amount", "amount", castTo = Some("double"))))
    println("MAPPED-SCHEMA: " + mapped.schema.simpleString)

    val target = graft.Scratch.dir("warehouse").toString + "/sales.parquet"
    MappedImport.appendTo(mapped, target)
    MappedImport.appendTo(
      MappedImport(SpreadsheetDir.loadSheet(spark, wb, "refunds.json"), Seq(
        ColumnSpec("id", "sale_id", castTo = Some("bigint")),
        ColumnSpec("region", "region"),
        ColumnSpec("amount", "amount", castTo = Some("double")))), target)

    val back = spark.read.parquet(target).orderBy("sale_id")
    println("TARGET-ROWS:")
    back.collect().foreach(r => println("  " + r))
    spark.stop()
  }
}
