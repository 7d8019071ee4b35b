package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table lifecycle over the parquet-directory catalog — the CREATE/ALTER/
  * DROP TABLE surface of the reference's SQL editor (keyword list,
  * SQL_DATA_INTEGRATION_TOOL.py:387-393) on immutable storage: CREATE
  * writes an empty typed dataset, ALTER is a schema-evolving rewrite, DROP
  * removes the dataset.
  */
object Ddl {

  def createTable(spark: SparkSession, dir: String, name: String,
      schema: StructType): Unit =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      .write.mode("errorifexists").parquet(s"$dir/$name.parquet")

  /** ALTER TABLE ADD COLUMN (with a default expression): schema-evolving
    * rewrite; on real deployments this is a metadata-only op on formats
    * with schema evolution — parquet-dir keeps it explicit. */
  def addColumn(spark: SparkSession, dir: String, name: String,
      colName: String, value: org.apache.spark.sql.Column): Unit =
    rewrite(spark, dir, name)(_.withColumn(colName, value))

  /** ALTER TABLE DROP COLUMN: projection rewrite (same rewrite shape as
    * [[addColumn]]; metadata-only on lakehouse formats). */
  def dropColumn(spark: SparkSession, dir: String, name: String,
      colName: String): Unit =
    rewrite(spark, dir, name) { df =>
      require(df.columns.contains(colName), s"no column $colName in $name")
      df.drop(colName)
    }

  /** ALTER TABLE RENAME COLUMN: projection rewrite. */
  def renameColumn(spark: SparkSession, dir: String, name: String,
      from: String, to: String): Unit =
    rewrite(spark, dir, name) { df =>
      require(df.columns.contains(from), s"no column $from in $name")
      require(!df.columns.contains(to), s"column $to already exists in $name")
      df.withColumnRenamed(from, to)
    }

  /** Full-table rewrite through a temp dir + atomic-ish rename — shared by
    * every ALTER variant on the parquet-dir catalog. */
  private def rewrite(spark: SparkSession, dir: String, name: String)(
      f: DataFrame => DataFrame): Unit = {
    val path = s"$dir/$name.parquet"
    val tmp = s"$dir/.$name.parquet.tmp"
    f(spark.read.parquet(path)).write.mode("overwrite").parquet(tmp)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmp), new Path(path))
  }

  def dropTable(spark: SparkSession, dir: String, name: String): Unit = {
    val p = new Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
  }

  def tableExists(spark: SparkSession, dir: String, name: String): Boolean = {
    val p = new Path(s"$dir/$name.parquet")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** INSERT INTO ... VALUES / SELECT — distributed append. */
  def insertInto(df: DataFrame, dir: String, name: String): Unit =
    df.write.mode("append").parquet(s"$dir/$name.parquet")
}
