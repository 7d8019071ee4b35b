package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Physical-layout maintenance for parquet directories — the two jobs every
  * 100 TB lake runs nightly and the reference's single-file world never
  * needed: small-file compaction (streaming ingest and dynamic-partition
  * writes fragment tables into thousands of KB-files, and open-file
  * overhead then dominates scans) and range-clustering (sorting files by a
  * filter column so parquet row-group min/max stats — and any engine's
  * zonemaps — skip everything outside the predicate).
  */
object Layout {

  /** Total bytes + file count of a parquet dir (data files only). */
  def stats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(s => s.isFile &&
      !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
    (files.map(_.getLen).sum, files.length)
  }

  /** Compact a fragmented parquet dir to ~targetBytes files in place
    * (temp-dir + rename, same swap as the ALTER rewrites). Uses
    * round-robin repartition, not coalesce: coalesce merges ADJACENT
    * input splits, so one hot input file yields one hot output file —
    * an even rewrite costs the shuffle and is worth it in a maintenance
    * pass that exists to fix skewed layout. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Int = {
    val (bytes, _) = stats(spark, dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = dir + ".compact.tmp"
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(dir), true)
    fs.rename(new Path(tmp), new Path(dir))
    nFiles
  }

  /** Write `df` range-clustered on `keys`: repartitionByRange gives each
    * output file a disjoint key interval, sortWithinPartitions orders rows
    * inside it — so parquet row-group min/max stats satisfy point/range
    * predicates by skipping whole files. The sampled range boundaries cost
    * one pass; reads with a key predicate save it back on every query. */
  def writeClustered(df: DataFrame, outDir: String, nFiles: Int,
      keys: Column*): Unit =
    df.repartitionByRange(nFiles, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode("overwrite").parquet(outDir)
}
