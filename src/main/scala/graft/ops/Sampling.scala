package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/sharding for training-data
  * pipelines. Spark's `sample()`/`randomSplit()` depend on seed AND
  * partitioning, so the selected rows change under repartition or engine
  * migration; a reproducible train/val/test split (and an auditable "which
  * 10% did we train on?") needs a pure function of the row key. The shard
  * is the first 60 bits of md5("salt:key") mod buckets — any engine with
  * md5 (DuckDB, Trino, Python, ...) selects byte-identical rows. At 100 TB
  * this is one codegen'd projection: no shuffle, no state, prunes with the
  * scan when the shard predicate is pushed down.
  */
object Sampling {

  /** Stable shard id in [0, buckets) for a row key. Change `salt` to draw
    * an independent split from the same keys. */
  def shard(key: Column, buckets: Int, salt: String = "shard"): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(buckets.toLong))

  /** Keep rows whose shard falls below `pct` of `buckets` — a deterministic
    * `pct/buckets` sample. */
  def sampleByHash(key: Column, pct: Int, buckets: Int = 100,
      salt: String = "shard"): Column =
    shard(key, buckets, salt) < pct
}
