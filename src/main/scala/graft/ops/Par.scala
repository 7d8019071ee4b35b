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
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }
}
