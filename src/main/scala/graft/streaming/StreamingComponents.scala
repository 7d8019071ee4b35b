package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.dedup.Dedup

/** Streaming maintenance of the duplicate-cluster component map — the
  * landed-artifact discipline (q198/q215/q222/q225) applied to
  * CONNECTIVITY, completing the dedup lifecycle the way StreamingMmIndex
  * completed the fingerprint index's: near-duplicate PAIRS arrive with
  * the crawl (the q147 delta-pair flow), and the standing (node →
  * component-min) map is maintained without ever re-running the
  * corpus-wide fixpoint.
  *
  * The landed partial is each micro-batch's OWN local closure — its
  * pairs collapsed to (node, batch-local component min) star rows by
  * [[Dedup.connectedComponents]]. That artifact is a pure function of
  * the batch alone, which is what makes landing idempotent under
  * at-least-once foreachBatch (shard = batch id, overwrite; a replayed
  * batch rewrites byte-equivalent content) — the lesson of the sibling
  * streams, and the reason the fold must NOT land "what changed vs the
  * standing map": that delta is a function of everything landed so far,
  * so a replayed batch would re-adjudicate against a map that already
  * absorbed it and overwrite its shard with an empty change set.
  * Star rows lose no connectivity (u—rep—v reaches whatever u—v did)
  * and are node-bounded, never pair-bounded: a 10⁶-pair boilerplate
  * clique lands as 10⁴ star rows if it has 10⁴ members.
  *
  * The release map is the [[Dedup.deltaComponents]] FOLD of the landed
  * shards: each shard's stars are delta pairs against the standing map
  * — the standing side touched by two scans and zero exchanges, the
  * fixpoint bounded by the shard, the merge table answer-sized. Labels
  * are component minima throughout, so the fold is order-invariant
  * (components of a union don't care how the union was split) and
  * min-merge ≡ batch deltaComponents ≡ from-scratch — the oracle and
  * the unit pins check exactly those identities.
  */
object StreamingComponents {

  /** Drains `pairsStream` (AvailableNow; columns id_a, id_b), landing
    * each micro-batch's local closure under `dir`/cc/shard=batchId;
    * returns `dir`. Batches whose pairs are all self-loops land nothing
    * (their closure is empty — same as an empty batch). */
  def landPartials(spark: SparkSession, pairsStream: DataFrame,
      dir: String): String = {
    val q = pairsStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val local = Dedup.connectedComponents(
          batch.toDF().select(col("id_a"), col("id_b")), "id_a", "id_b")
        local.write.mode("overwrite").parquet(s"$dir/cc/shard=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    dir
  }

  /** The release (id, cluster_id) map from the landed partials alone:
    * shard 0's closure seeds the standing map, every later shard folds
    * in through [[Dedup.deltaComponents]] — the incremental-maintenance
    * path exercised once per landed batch, exactly as a production
    * ingest would run it. One row per node that ever appeared in a
    * pair; cluster_id = the component minimum over ALL landed pairs. */
  def mergedMap(spark: SparkSession, dir: String): DataFrame = {
    val shards = spark.read.parquet(s"$dir/cc")
      .select(col("id"), col("cluster_id"), col("shard").cast("long").as("shard"))
      .localCheckpoint(true)
    val ids = shards.select(col("shard")).distinct()
      .collect().map(_.getLong(0)).sorted // batch-count-sized by contract
    var standing = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cluster_id",
          org.apache.spark.sql.types.LongType, nullable = false))))
    ids.foreach { sid =>
      val shard = shards.filter(col("shard") === sid).drop("shard")
      // lazy: the next fold's first action (advance's isEmpty probe)
      // materializes the blocks — one scheduling round-trip saved per
      // shard vs the eager form (r16)
      standing = advance(standing, shard).localCheckpoint(false)
    }
    standing
  }

  /** Offline compaction of the landed chain — the LSM discipline every
    * landed-artifact scaladoc in this package promises, made concrete:
    * rewrite every shard ≤ `upTo` as ONE partial (the local closure of
    * their union's star pairs — node-bounded, the same mergeable shape
    * as any batch partial) landed as `shard=<upTo>`, predecessors
    * removed. Semantically free by the fold's own invariant: labels are
    * component minima and components of a union don't care how the
    * union was split, so [[mergedMap]] over the compacted chain equals
    * the uncompacted fold node for node (the unit pin and the q236
    * gate). Operationally it bounds the chain: a year-long ingest's
    * fold cost tracks the compaction cadence, not the batch count, and
    * the compacted partial is ≤ the distinct-node count regardless of
    * how much pair mass the year carried. The closure is computed and
    * CHECKPOINTED before any predecessor is dropped — the rewrite is
    * crash-safe in the only window where both truths must coexist. */
  def compact(spark: SparkSession, dir: String, upTo: Long): Unit = {
    val olds = spark.read.parquet(s"$dir/cc")
      .filter(col("shard").cast("long") <= upTo)
    val stars = Dedup.connectedComponents(
      olds.select(col("cluster_id").as("id_a"), col("id").as("id_b")),
      "id_a", "id_b").localCheckpoint(true) // materialized pre-delete
    val root = new org.apache.hadoop.fs.Path(s"$dir/cc")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("shard=") &&
        p.getName.stripPrefix("shard=").toLong <= upTo)
      .foreach(p => fs.delete(p, true))
    stars.write.mode("overwrite").parquet(s"$dir/cc/shard=$upTo")
  }

  /** Fold ONE landed shard (a batch-local (id, cluster_id) closure) into
    * the standing map: the shard's star rows become delta pairs for
    * [[Dedup.deltaComponents]]; changed nodes relabel, shard nodes the
    * map has never seen enter (at the merged label when they attach, at
    * themselves when they are the union component's minimum). Exposed
    * for the chained-ingest ≡ batch unit pin. */
  def advance(standing: DataFrame, shard: DataFrame): DataFrame = {
    if (standing.isEmpty) return shard.select(col("id"), col("cluster_id"))
    val starPairs = shard
      .select(col("cluster_id").as("id_a"), col("id").as("id_b"))
    val changes = Dedup.deltaComponents(standing, starPairs)
      .select(col("node").as("id"), col("new_rep"))
    val updated = standing.join(broadcast(changes), Seq("id"), "left")
      .select(col("id"),
        coalesce(col("new_rep"), col("cluster_id")).as("cluster_id"))
    // shard nodes absent from the map: label from the merge table when
    // they attached to something smaller, themselves otherwise (a fresh
    // node missing from `changes` IS its union component's minimum).
    // Presence is probed the q197 way — shard ids broadcast over ONE
    // standing scan; the standing map itself never ships anywhere.
    val present = standing.select(col("id"))
      .join(broadcast(shard.select(col("id"))), Seq("id"), "left_semi")
      .localCheckpoint(false) // shard-sized; first consumer materializes
    val fresh = shard.select(col("id"))
      .join(broadcast(present), Seq("id"), "left_anti")
      .join(broadcast(changes), Seq("id"), "left")
      .select(col("id"), coalesce(col("new_rep"), col("id")).as("cluster_id"))
    updated.unionByName(fresh)
  }
}
