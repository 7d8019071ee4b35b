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

  /** Total bytes + file count of a parquet dir (data files only,
    * recursive — a hive-partitioned layout keeps its data one level down,
    * and a non-recursive listing would report (0, 0) for it). */
  def stats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L; var n = 0
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        bytes += s.getLen; n += 1
      }
    }
    (bytes, n)
  }

  /** Compact a fragmented FLAT parquet dir to ~targetBytes files in place.
    * Uses round-robin repartition, not coalesce: coalesce merges ADJACENT
    * input splits, so one hot input file yields one hot output file — an
    * even rewrite costs the shuffle and is worth it in a maintenance pass
    * that exists to fix skewed layout.
    *
    * Refuses partitioned layouts (subdirectories): a plain read+rewrite
    * would silently flatten `k=v/` dirs into unpartitioned files and lose
    * pruning — compact each leaf partition dir instead.
    *
    * Swap protocol (crash-safe; a reader never observes a missing table):
    * write to `dir.compact.tmp`, VERIFY its row count against the source,
    * rename the original aside to `dir.compact.old`, rename tmp into
    * place, delete the old copy last. Every rename's boolean return is
    * checked; a failed final rename rolls the original back. */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.listStatus(p).exists(s => s.isDirectory &&
        !s.getPath.getName.startsWith("_")),
      s"compact: $dir contains subdirectories (a partitioned layout?) — " +
        "rewriting would flatten the partition scheme; compact leaf dirs instead")
    val (bytes, _) = stats(spark, dir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val expected = spark.read.parquet(dir).count()
    val tmp = new Path(dir + ".compact.tmp")
    spark.read.parquet(dir).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    val written = spark.read.parquet(tmp.toString).count()
    require(written == expected,
      s"compact: rewrite has $written rows, source has $expected — " +
        "aborting, original untouched")
    val old = new Path(dir + ".compact.old")
    if (fs.exists(old)) fs.delete(old, true)
    if (!fs.rename(p, old))
      throw new IllegalStateException(s"compact: could not move $dir aside")
    if (!fs.rename(tmp, p)) {
      fs.rename(old, p) // restore the original before failing
      throw new IllegalStateException(
        s"compact: rename of $tmp into place failed; original restored")
    }
    fs.delete(old, true)
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
