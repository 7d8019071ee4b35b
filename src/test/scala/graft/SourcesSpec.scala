package graft

import java.nio.file.{Files, Paths}
import graft.sources.{ColumnSpec, MappedImport, Partitioned, SpreadsheetDir, Tables}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("full spreadsheet import workflow: list sheets, load, map, append") {
    val wb = Files.createTempDirectory("workbook").toString
    Files.write(Paths.get(s"$wb/sales.csv"),
      "id,region,amount\n1,EMEA,10.5\n2,APAC,20.0\n".getBytes)
    Files.write(Paths.get(s"$wb/refunds.json"),
      """{"id": 9, "region": "EMEA", "amount": -3.5}""".getBytes)

    assert(SpreadsheetDir.listSheets(spark, wb) == Seq("refunds.json", "sales.csv"))

    val sheet = SpreadsheetDir.loadSheet(spark, wb, "sales.csv")
    val mapped = MappedImport(sheet, Seq(
      ColumnSpec("id", "sale_id", castTo = Some("bigint")),
      ColumnSpec("region", "region"),
      ColumnSpec("amount", "amount", castTo = Some("double"))))

    val target = Files.createTempDirectory("tgt").toString + "/sales.parquet"
    MappedImport.appendTo(mapped, target)
    MappedImport.appendTo(mapped, target) // second append accumulates
    val back = spark.read.parquet(target)
    assert(back.count() == 4)
    assert(back.columns.sorted.toSeq == Seq("amount", "region", "sale_id"))
    assert(back.agg(org.apache.spark.sql.functions.sum($"amount")).head().getDouble(0) == 61.0)
  }

  test("loadFormat reads csv and json with matching rows") {
    val wb = Files.createTempDirectory("fmt").toString
    Files.write(Paths.get(s"$wb/a.csv"), "x,y\n1,foo\n2,bar\n".getBytes)
    val df = Tables.loadFormat(spark, s"$wb/a.csv", "csv")
    assert(df.count() == 2 && df.columns.toSeq == Seq("x", "y"))
  }

  test("day-partitioned events prune to a strict file subset with exact rows") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graft.bridge.scannedFileCount
    val dir = Files.createTempDirectory("part").toString + "/events_by_day"
    Partitioned.writeEventsByDay(spark, sfDir, dir)
    val all = spark.read.parquet(dir)
    val day = all.agg(min($"day")).head().get(0).toString
    val pruned = Partitioned.readDay(spark, dir, day)
    val expected = Tables.load(spark, sfDir, "events")
      .filter(date_format($"ts", "yyyy-MM-dd") === day).count()
    assert(pruned.count() == expected && expected > 0)
    assert(scannedFileCount(pruned) > 0 &&
      scannedFileCount(pruned) < scannedFileCount(all))
  }
}
