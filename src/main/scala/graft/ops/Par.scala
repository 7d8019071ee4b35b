package graft.ops

import org.apache.spark.sql.DataFrame

/** Scan-stage parallelism guard for CPU-heavy per-row kernels (md5 URL
  * canonicalization, BPE segmentation, trigram generation, image/audio
  * codecs): everything upstream of a plan's first exchange runs at FILE
  * parallelism, and the test corpora are one small parquet file with one
  * row group — one scan task — so a per-row kernel chain serializes on
  * one core while the rest idle. One slim-row round-robin shuffle buys a
  * cores-wide map stage; callers apply it only where rows then meet a
  * kernel whose per-row cost dwarfs a row move, and only to inputs whose
  * downstream keys by value (row placement free to change).
  *
  * A production many-file layout already carries ≥ cores scan partitions
  * and passes through untouched — the gate never fires at 100 TB; it
  * exists for single-file inputs and single-file streaming micro-batches
  * (the [[graft.streaming.EventsStream.rebalanced]] contract, shared). */
object Par {
  def balanced(df: DataFrame): DataFrame = {
    // A streaming DataFrame passes through untouched: df.rdd would force
    // physical planning at construction time and throw on a stream, and
    // the operators embedding this guard are also exposed as SQL table
    // functions where that would fire during resolution. Streaming
    // callers rebalance per micro-batch inside foreachBatch instead
    // (EventsStream.rebalanced delegates here with a batch DF).
    if (df.isStreaming) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** Row-count-aware form for micro-batches whose size swings orders of
    * magnitude (q198's 8-row twin slices vs its ~6.6k-image organic
    * slice): rebalancing EVERY batch regressed the tiny ones — a shuffle
    * plus a cores-wide stage of near-empty tasks for kernels that are
    * microseconds per row (r15 A/B, q189 cpu 30→78 s class) — so the
    * target width derives from the batch's measured row count, one task
    * per `minRowsPerTask` rows capped at cores. A tiny batch keeps its
    * single task; a codec-heavy batch decodes cores-wide. The caller
    * supplies `rows` (it usually has a cheap count in hand); the gate
    * stays a no-op whenever the input already carries enough partitions. */
  def balancedRows(df: DataFrame, rows: Long,
      minRowsPerTask: Long = 8): DataFrame = {
    if (df.isStreaming) return df
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val target = math.min(cores.toLong,
      (rows + minRowsPerTask - 1) / minRowsPerTask).toInt
    if (target > df.rdd.getNumPartitions) df.repartition(target) else df
  }
}
