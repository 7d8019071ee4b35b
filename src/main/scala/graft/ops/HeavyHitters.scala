package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact heavy hitters over a keyspace too large to groupBy.
  *
  * The reference tool's value-counts report (SQL_DATA_INTEGRATION_TOOL.py
  * 1146–1230 builds per-column frequency reports) is a full GROUP BY —
  * fine when the distinct keyspace fits a shuffle, hopeless at 100 TB of
  * e.g. URLs or tokens where the keyspace itself is corpus-sized. This is
  * the bounded-memory form:
  *
  *  1. CANDIDATES — one pass of per-partition Misra–Gries summaries
  *     (Misra & Gries 1982; mergeable per Agarwal et al., PODS'12): each
  *     task keeps at most `capacity` counters, decrement-all on overflow.
  *     A key absent from EVERY partition summary lost at most
  *     n_p/(capacity+1) count in partition p, so its global count is
  *     ≤ n/(capacity+1): the union of summary keys (≤ tasks × capacity
  *     rows — answer-sized, never keyspace-sized) is a guaranteed
  *     superset of every key with count > n/(capacity+1).
  *  2. EXACT RECOUNT — broadcast the candidate set back over the scan,
  *     count only surviving rows (map-side partial_count keeps the
  *     shuffle at tasks × candidates), rank (count desc, key).
  *
  * The result is provably the EXACT top-m whenever the m-th count
  * exceeds n/(capacity+1) — checked at runtime, loudly: a capacity too
  * small for the distribution throws rather than silently truncating.
  * Zipfian keyspaces (tokens, domains, user ids) satisfy the check with
  * small capacities; the memory per task is capacity entries, invariant
  * in corpus size.
  */
object HeavyHitters {

  /** Misra–Gries summary of one partition: at most `capacity` (key,
    * lower-bound count) survivors. true(k) − lb(k) ≤ n_p/(capacity+1);
    * a dropped key's true count is ≤ n_p/(capacity+1). Decrement-all
    * costs are paid one-for-one by prior increments — O(1) amortized. */
  private[graft] def summarize(it: Iterator[String], capacity: Int):
      Iterator[(String, Long)] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { k =>
      counters.get(k) match {
        case Some(v) => counters(k) = v + 1
        case None if counters.size < capacity => counters(k) = 1L
        case None => // arriving key + every counter each give up one count
          val dead = List.newBuilder[String]
          counters.foreach { case (kk, vv) =>
            if (vv == 1L) dead += kk else counters(kk) = vv - 1 }
          dead.result().foreach(counters.remove)
      }
    }
    counters.iterator
  }

  /** The candidate superset: union of per-partition summary keys.
    * ≤ partitions × capacity rows; contains every key whose global count
    * exceeds n/(capacity+1). */
  def candidates(keys: Dataset[String], capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = keys.sparkSession
    import spark.implicits._
    keys.mapPartitions(it => summarize(it, capacity))
      .toDF("hh_key", "hh_lb")
      .groupBy("hh_key").agg(sum("hh_lb").as("hh_lb")) // dedup across partitions
      .select("hh_key")
  }

  /** Exact top-`m` (key, n) of `keyCol` in `df`, by (n desc, key).
    * Throws if the Misra–Gries guarantee cannot certify exactness — the
    * m-th count must exceed n/(capacity+1); raise `capacity` if it ever
    * fires (memory is capacity entries per task, so this is cheap).
    * `knownTotal` skips the row-count pass when the caller already knows
    * n (catalog/manifest row stats, or a cheaper aggregate than the key
    * materialization — e.g. a token-COUNT projection instead of a token
    * explode). */
  def exactTopK(df: DataFrame, keyCol: String, m: Int, capacity: Int,
      knownTotal: Option[Long] = None): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("hh_key")).as[String]
    val cands = candidates(keys, capacity)
    val top = keys.toDF("hh_key")
      .join(broadcast(cands), "hh_key")
      .groupBy("hh_key").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("hh_key"))
      .limit(m)
      .collect()
    val total = knownTotal.getOrElse(keys.count())
    val floor = total.toDouble / (capacity + 1)
    if (top.nonEmpty) {
      val mth = top.last.getLong(1)
      require(mth > floor,
        s"heavy-hitters exactness not certified: rank-$m count $mth ≤ " +
          s"n/(capacity+1) = $floor — raise capacity (= $capacity)")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(top.toIndexedSeq, 1),
      new org.apache.spark.sql.types.StructType()
        .add("hh_key", "string").add("n", "long"))
  }
}
