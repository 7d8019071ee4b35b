package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned (hive-style directory) layouts — the table-stakes layout for
  * time-series data at 100 TB: a day-partitioned events table turns any
  * query with a day predicate into a planning-time directory prune
  * (`PartitionFilters` in the scan), so a one-day query over a 10-year
  * corpus opens ~1/3650th of the files. The reference's single-table import
  * world (SQL_DATA_INTEGRATION_TOOL.py:466-685) has no analog; this is
  * what its event/date data would become on a lake.
  */
object Partitioned {

  /** Re-lay the events table day-partitioned (`.../day=YYYY-MM-DD/`).
    * One shuffle-free pass: partitionBy splits files by the derived column
    * at write time. */
  def writeEventsByDay(spark: SparkSession, sfDir: String, outDir: String): Unit =
    Tables.load(spark, sfDir, "events")
      .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(outDir)

  /** One-day slice of a day-partitioned layout. The day predicate is a
    * partition filter: directories outside it are never listed into the
    * scan (check `PartitionFilters` in explain, or `inputFiles`). */
  def readDay(spark: SparkSession, dir: String, day: String): DataFrame =
    spark.read.parquet(dir).filter(col("day") === day)
}
