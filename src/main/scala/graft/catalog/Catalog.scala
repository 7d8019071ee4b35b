package graft.catalog

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructType, StructField, StringType, BooleanType}

/** Catalog introspection: the reference's metadata surface
  * (SQL_DATA_INTEGRATION_TOOL.py:155-239 — `get_databases`, `get_tables`,
  * `get_table_design`, `get_table_columns`, `get_primary_keys`) over a
  * parquet-directory catalog. Schema comes from parquet footers (no data
  * scan); primary-key discovery — absent from parquet metadata — is a
  * distributed distinct-count probe, the scalable analog of
  * INFORMATION_SCHEMA.KEY_COLUMN_USAGE.
  */
object Catalog {

  /** "Databases on the server" (ref 155-170) = child directories that
    * contain at least one parquet dataset. */
  def listDatabases(spark: SparkSession, rootDir: String): Seq[String] = {
    val p = new Path(rootDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(d => fs.listStatus(d).exists(_.getPath.getName.endsWith(".parquet")))
      .map(_.getName)
      .sorted
  }

  /** "Tables in the selected database" = parquet datasets in the directory. */
  def listTables(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
      .map(_.stripSuffix(".parquet"))
      .sorted
  }

  /** Table design (ref 183-196): one row per column — name, type, nullable,
    * default. The reference's `get_table_columns` (ref 198-220) also returns
    * COLUMN_DEFAULT from INFORMATION_SCHEMA; parquet stores no column
    * defaults (a missing value is simply null), so the column is surfaced —
    * keeping the reference's row shape — and is always null for parquet
    * datasets. Sources with real defaults (a future JDBC catalog) populate
    * it. */
  def tableDesign(spark: SparkSession, df: DataFrame): DataFrame = {
    val rows = df.schema.fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString, f.nullable,
        null.asInstanceOf[String]))
    val schema = StructType(Seq(
      StructField("column_name", StringType, nullable = false),
      StructField("data_type", StringType, nullable = false),
      StructField("is_nullable", BooleanType, nullable = false),
      StructField("column_default", StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy("column_name")
  }

  /** Primary-key candidates (ref 222-239): columns whose distinct count
    * equals the row count. One distributed aggregate pass over all candidate
    * columns at once (count_distinct is partial-aggregated; no per-column
    * scans). */
  def primaryKeyCandidates(df: DataFrame, candidates: Seq[String] = Seq.empty): Seq[String] = {
    val cols = if (candidates.nonEmpty) candidates else df.columns.toSeq
    val aggs = count(lit(1)).as("__n") +: cols.map(c => count_distinct(col(c)).as(s"__d_$c"))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("__n")
    cols.filter(c => r.getAs[Long](s"__d_$c") == n)
  }
}
