package graft.sources

import scala.jdk.CollectionConverters._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, lit, shiftleft, when}

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
    * Swap protocol (crash-safe: the verified data always exists at the
    * table path or `.old`; a concurrent reader may transiently fail
    * inside the two-rename swap window — a two-path rename swap cannot
    * be reader-atomic):
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

  /** Write `df` z-order-clustered on two numeric columns: rows sort by the
    * bit-interleaved rank of (a, b), so file/row-group min-max stats stay
    * tight on BOTH columns at once — a point or range predicate on EITHER
    * column skips most files. [[writeClustered]] on (a, b) only prunes on
    * a (every file spans b's full range); z-order is the multi-column
    * layout every lakehouse OPTIMIZE ZORDER runs, built here from three
    * Spark primitives:
    *
    *  1. per-column rank quantization to 8 bits — 255 approx-quantile
    *     boundaries per column (one answer-sized aggregate, broadcast
    *     back; rank = boundaries-passed, the q80 bucketing shape), which
    *     makes interleaving distribution-independent (skewed columns
    *     still fill all 256 codes);
    *  2. bit interleave (a7 b7 a6 b6 … a0 b0) as a codegen'd fold of
    *     shift/mask/or — one 16-bit z-value column;
    *  3. repartitionByRange + sortWithinPartitions on the z-value (the
    *     [[writeClustered]] machinery, reused).
    *
    * The quantile pass is one extra scan; reads with predicates on either
    * column save it back on every query. */
  def writeZOrdered(df: DataFrame, outDir: String, nFiles: Int,
      colA: String, colB: String): Unit = {
    val z = zValue(df, colA, colB)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Recover from a crash mid-swap and clean swap debris for a table
    * maintained by [[compact]] / [[graft.streaming.StreamMerge]] (both use
    * the same tmp → aside → into-place rename protocol). Recovery rule,
    * derived from the protocol's invariant (the aside rename happens ONLY
    * after the tmp write is verified, and the old copy is deleted ONLY
    * after the new table is in place):
    *
    *  - table missing + `.old` present → the crash hit between
    *    rename-aside and rename-into-place: RESTORE `.old` to the table
    *    path (the tmp may be complete, but the verified-original is the
    *    safe restore — the maintenance op simply re-runs);
    *  - table present → any `.tmp` / `.old` is debris from a completed or
    *    abandoned swap: delete it.
    *
    * Returns a human-readable action log; empty = nothing to do. */
  def vacuumSwapDebris(spark: SparkSession, dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val suffixes = Seq(".compact.tmp", ".compact.old", ".merge.tmp", ".merge.old")
    val olds = suffixes.filter(_.endsWith(".old")).map(s => new Path(dir + s))
    val actions = scala.collection.mutable.ArrayBuffer[String]()
    if (!fs.exists(p)) {
      olds.find(fs.exists) match {
        case Some(old) =>
          if (!fs.rename(old, p))
            throw new IllegalStateException(s"vacuum: restore of $old to $dir failed")
          actions += s"restored $old -> $dir"
        case None => // nothing to restore; fall through to debris cleanup
      }
    }
    // debris cleanup runs whether or not the table exists: a crash during
    // an INITIAL write (tmp written, no table, no old — StreamMerge's
    // first batch) leaves only a `.tmp`, and skipping it would report a
    // clean log while debris sits on disk forever
    suffixes.foreach { s =>
      val d = new Path(dir + s)
      if (fs.exists(d)) { fs.delete(d, true); actions += s"deleted $d" }
    }
    actions.toSeq
  }

  /** Per-file zonemap manifest from parquet FOOTERS only — (file,
    * n_rows, column, min, max as strings) for every top-level primitive
    * column: the audit tool behind the writeClustered/writeZOrdered
    * claims, and the scan-planning manifest a lakehouse keeps in its
    * transaction log. Footers are KBs regardless of file size, so this
    * reads metadata, not data — listing + footer parse distribute over
    * the files (one task per batch of paths), nothing corpus-sized moves.
    * Min/max render through parquet's own type-aware stringifier
    * (numeric order for numerics, unsigned-lexicographic for strings). */
  def fileStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = listDataFiles(fs, p).map(_.getPath.toString)
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    spark.createDataset(files).repartition(math.max(1, files.length / 32))
      .mapPartitions { paths =>
        val conf = confBc.value.value
        paths.flatMap { f =>
          val in = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(new Path(f), conf)
          val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
          try {
            val footer = reader.getFooter
            val rows = footer.getBlocks.asScala.map(_.getRowCount).sum
            // fold row-group column statistics per column path
            val agg = scala.collection.mutable.LinkedHashMap[String,
              org.apache.parquet.column.statistics.Statistics[_]]()
            footer.getBlocks.asScala.foreach { block =>
              block.getColumns.asScala.foreach { cc =>
                val name = cc.getPath.toDotString
                val st = cc.getStatistics
                if (st != null && !st.isEmpty)
                  agg.get(name) match {
                    case Some(acc) => mergeStats(acc, st)
                    case None => agg(name) = st.copy()
                  }
              }
            }
            agg.iterator.map { case (name, st) =>
              (f, rows, name,
                Option(st.minAsString()).getOrElse(""),
                Option(st.maxAsString()).getOrElse(""))
            }.toSeq
          } finally reader.close()
        }
      }.toDF("file", "n_rows", "column", "min", "max")
  }

  /** The file subset of `dir` that CAN contain rows with `column` in
    * [lo, hi], per the [[fileStats]] footer manifest — the planning half
    * of a manifest-pruned scan. Conservative by construction: a file is
    * dropped ONLY if its zonemap proves disjointness (max < lo or
    * min > hi with parseable numeric stats); files with missing or
    * non-numeric stats for `column` are kept. Numeric columns only —
    * parquet stringifies string min/max in unsigned-lexicographic order,
    * and a numeric cast of those would prune wrongly (it comes back
    * NULL, which lands in the conservative keep-branch). */
  def prunedFiles(spark: SparkSession, dir: String, column: String,
      lo: Double, hi: Double): Seq[String] = {
    import spark.implicits._
    val stats = fileStats(spark, dir).persist()
    try {
      val droppable = stats
        .filter(col("column") === column)
        .select(col("file"), col("min").cast("double").as("mn"),
          col("max").cast("double").as("mx"))
        .filter(col("mn").isNotNull && col("mx").isNotNull &&
          (col("mx") < lit(lo) || col("mn") > lit(hi)))
        .select("file")
      stats.select("file").distinct().except(droppable)
        .as[String].collect().sorted.toSeq
    } finally { stats.unpersist(); () }
  }

  /** [[prunedFiles]] for STRING keys (URLs, domains — the corpus keys a
    * numeric zonemap refuses): conservative truncated-prefix zonemaps.
    * Parquet stringifies binary min/max in UNSIGNED-lexicographic byte
    * order while JVM string comparison is UTF-16 code-unit order — the
    * two agree only where every compared character is ASCII, so raw
    * string comparisons against footer stats can prune WRONGLY on
    * non-ASCII keys (the reason the numeric path excludes strings
    * entirely). This variant compares only through provably-safe
    * bounds, each widened conservatively (Iceberg's truncate-transform
    * discipline):
    *   - lower bound of a file's min = its ASCII-safe prefix (truncate
    *     at `prefixLen` chars or the first non-ASCII char) — a prefix
    *     precedes its extensions in BOTH orders, and an all-ASCII
    *     prefix compares consistently against ANY string in both
    *     orders (the first differing position is ASCII on one side);
    *   - upper bound of a file's max = the exact max when it is pure
    *     ASCII and untruncated, else its ASCII-safe prefix with the
    *     last character incremented (every extension of p sorts below
    *     p[:-1]+(p[-1]+1)); when no ASCII increment exists the file is
    *     simply kept.
    * A file is dropped ONLY when maxUB < lo or minLB > hi — both
    * implications hold for the true values in either ordering, so
    * pruning can never lose a row; missing/empty stats land in the
    * keep-branch exactly like the numeric path. Truncation also makes
    * the decision robust to parquet's OWN binary-stats truncation
    * (which widens the same way: stored min ≤ true min, stored max
    * incremented past the true max). */
  def prunedFilesString(spark: SparkSession, dir: String, column: String,
      lo: String, hi: String, prefixLen: Int = 16): Seq[String] = {
    require(prefixLen >= 1, "prefixLen must be positive")
    require(lo <= hi, s"empty range: lo '$lo' > hi '$hi'")
    import spark.implicits._
    val stats = fileStats(spark, dir).persist()
    try {
      val rows = stats.filter(col("column") === column)
        .select("file", "min", "max").as[(String, String, String)].collect()
      def asciiPrefix(s: String): String = {
        val upTo = math.min(s.length, prefixLen)
        var i = 0
        while (i < upTo && s.charAt(i) < 0x80) i += 1
        s.substring(0, i)
      }
      // smallest all-ASCII string strictly above every extension of p;
      // None when p is empty or ends at the ASCII ceiling
      def incremented(p: String): Option[String] = {
        var i = p.length - 1
        while (i >= 0 && p.charAt(i) >= 0x7f) i -= 1
        if (i < 0) None
        else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
      }
      val droppable = rows.filter { case (_, mn, mx) =>
        if (mn == null || mx == null || mn.isEmpty || mx.isEmpty) false
        else {
          val minLB = asciiPrefix(mn)
          val exactMax = mx.length <= prefixLen && mx.forall(_ < 0x80)
          val below = // whole file < lo?
            if (exactMax) mx < lo
            else incremented(asciiPrefix(mx)).exists(_ <= lo)
          val above = minLB > hi // whole file > hi?
          below || above
        }
      }.map(_._1).toSet
      stats.select("file").distinct().as[String].collect()
        .filterNot(droppable).sorted.toSeq
    } finally { stats.unpersist(); () }
  }

  /** [[readPrunedByRange]] for string keys: scan only the files
    * [[prunedFilesString]] admits, with the residual inclusive-range
    * filter pushed to the scan (string literals push down cleanly —
    * row-group stats inside the kept files keep pruning). */
  def readPrunedByRangeString(spark: SparkSession, dir: String,
      column: String, lo: String, hi: String,
      prefixLen: Int = 16): DataFrame = {
    val keep = prunedFilesString(spark, dir, column, lo, hi, prefixLen)
    val df = if (keep.isEmpty) spark.read.parquet(dir)
      else spark.read.parquet(keep: _*)
    val residual = col(column) >= lit(lo) && col(column) <= lit(hi)
    if (keep.isEmpty) df.filter(residual).limit(0) else df.filter(residual)
  }

  /** Content fingerprint of a parquet dir (or single file): md5 over the
    * sorted (relative path, length, mtime) manifest — the cheap identity
    * that lets per-process memos (DedupCache, IvfIndexCache, the q94
    * bucketed-table guard) detect an in-place rewrite: same dir,
    * different files → different key, so a changed corpus can never be
    * served a stale pair set / index / bucketed table. Driver-side
    * listing only — no data read, no Spark job (the same metadata
    * [[fileStats]] reads, minus the footers). */
  /** [[dirFingerprint]] for an explicit file list (e.g. a catalog
    * table's `inputFiles`): md5 over the sorted (path, length, mtime)
    * manifest — same memo-correctness property, driver-side metadata
    * reads only. */
  def filesFingerprint(spark: SparkSession, paths: Seq[String]): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    val manifest = paths.map { f =>
      val p = new Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }.sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  def dirFingerprint(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return "absent"
    val manifest = listDataFiles(fs, p)
      .map(s => s"${s.getPath.toString.stripPrefix(p.toString)}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString("\n")
    java.security.MessageDigest.getInstance("MD5")
      .digest(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }

  /** Manifest-pruned scan: hand Spark ONLY the files [[prunedFiles]]
    * admits, plus the residual row filter — [[fileStats]] turned from an
    * audit tool into the scan-planning path a lakehouse transaction log
    * provides. On a [[writeClustered]]/[[writeZOrdered]] table the file
    * list shrinks to the key range's covering subset BEFORE Spark lists
    * or opens anything — at 100 TB that is the difference between
    * footer-checking a million files and reading the dozen that matter
    * (row-group stats inside the kept files still prune further). */
  def readPrunedByRange(spark: SparkSession, dir: String, column: String,
      lo: Double, hi: Double): DataFrame = {
    val keep = prunedFiles(spark, dir, column, lo, hi)
    val df = if (keep.isEmpty) spark.read.parquet(dir)
      else spark.read.parquet(keep: _*)
    // residual literals carry the COLUMN's type, never double: a double
    // literal wraps the column in a cast Catalyst can't unwrap for
    // long↔double, and a cast-wrapped column defeats parquet filter
    // pushdown (the kept files' row-group stats would stop pruning). For
    // integral columns the equivalent integral bounds are ceil(lo) and
    // floor(hi) — truncation would wrongly widen a fractional bound.
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val (loB, hiB) = df.schema(column).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (lit(math.ceil(lo).toLong), lit(math.floor(hi).toLong))
      case dt => (lit(lo).cast(dt), lit(hi).cast(dt))
    }
    val residual = col(column) >= loB && col(column) <= hiB
    if (keep.isEmpty) df.filter(residual).limit(0) else df.filter(residual)
  }

  // parquet's Statistics[T <: Comparable[T]] existential defeats direct
  // Scala casts; both sides are the same concrete type per column by
  // construction (same column path, same schema), so erase once here
  private abstract class StatT extends Comparable[StatT]
  private def mergeStats(acc: org.apache.parquet.column.statistics.Statistics[_],
      st: org.apache.parquet.column.statistics.Statistics[_]): Unit = {
    type S = org.apache.parquet.column.statistics.Statistics[StatT]
    acc.asInstanceOf[S].mergeStatistics(st.asInstanceOf[S])
  }

  private def listDataFiles(fs: org.apache.hadoop.fs.FileSystem,
      p: Path): Seq[org.apache.hadoop.fs.FileStatus] = {
    val it = fs.listFiles(p, true)
    val out = scala.collection.mutable.ArrayBuffer[org.apache.hadoop.fs.FileStatus]()
    while (it.hasNext) {
      val s = it.next()
      val n = s.getPath.getName
      if (s.isFile && !n.startsWith("_") && !n.startsWith(".")) out += s
    }
    out.toSeq
  }

  /** The 16-bit interleaved z-value column for (colA, colB) of `df` —
    * exposed for tests and for callers composing their own write. */
  def zValue(df: DataFrame, colA: String, colB: String): Column = {
    def rank8(c: String): Column = {
      // 255 interior quantile boundaries -> rank in [0, 255]; one
      // answer-sized row, broadcast into the projection as a literal array
      val probs = (1 until 256).map(_ / 256.0)
      val bounds = df.select(expr(
        s"approx_percentile(CAST(`$c` AS DOUBLE), array(${probs.mkString(",")}), 10000)"))
        .head.getSeq[Double](0)
      val v = col(c).cast("double")
      // rank = number of boundaries strictly below the value, found by a
      // log-depth binary-search tree of nested whens: 8 comparisons
      // evaluated per row instead of the 255 a linear indicator sum
      // pays. Duplicate boundaries (skewed distributions) still resolve
      // to the strictly-below count — every index left of a taken
      // `v > bounds(mid)` branch is ≤ bounds(mid) < v, every index right
      // of a failed one is ≥ bounds(mid) ≥ v. A NULL v fails every
      // comparison and descends to rank 0, same as the linear sum.
      def search(lo: Int, hi: Int): Column =
        if (lo > hi) lit(lo)
        else {
          val mid = (lo + hi) / 2
          when(v > lit(bounds(mid)), search(mid + 1, hi))
            .otherwise(search(lo, mid - 1))
        }
      search(0, bounds.length - 1)
    }
    val ra = rank8(colA)
    val rb = rank8(colB)
    // interleave: a's bit i -> position 2i+1, b's bit i -> position 2i
    (0 until 8).map { i =>
      (shiftleft(ra.bitwiseAND(lit(1 << i)), i + 1))
        .bitwiseOR(shiftleft(rb.bitwiseAND(lit(1 << i)), i))
    }.reduce(_.bitwiseOR(_))
  }
}
