package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming crawl-frontier maintenance — the q198/q191 landed-artifact
  * treatment applied to q197's visited index: each micro-batch of
  * harvested links is adjudicated with [[graft.ops.Frontier.additions]]
  * against the visited set AS LANDED by its predecessors, then lands two
  * artifacts under idempotent `shard=<batchId>` directories:
  *
  *   - `additions/shard=<id>`: the batch's frontier additions
  *     (canonical_url, n_links, min_doc) — the incremental answer, FINAL
  *     at arrival: a target is emitted exactly once, at its
  *     first-sighting batch, with the counts from that batch (later
  *     links to it are revisits by then — the production enqueue
  *     semantics; a priority bump channel is a different operator).
  *   - `visited/shard=<id>`: the batch's newly-visited keys — exactly
  *     the addition keys, so the partial is ADDITION-sized (a mature
  *     crawl's revisit mass never lands twice). The visited set as of
  *     batch N is the plain union of the seed (`shard=-1`, the standing
  *     index landed once) and every partial with `shard < N` — the
  *     shards are DISJOINT by construction (once a target lands it is
  *     visited and can never be an addition again), so no distinct, no
  *     merge aggregate: the union IS the set, and Frontier.additions
  *     only ever scans it (bloom build + broadcast-semi probe — the
  *     visited side still never shuffles, per batch).
  *
  * Restart/at-least-once safety: a retried batch reads the same
  * predecessor partial set (its own half-landed shards excluded by
  * `shard < batchId`), recomputes byte-identical additions, and
  * overwrites its own two shards.
  */
object StreamingFrontier {

  /** Visited set from landed partials (seed + every shard < `upTo`). */
  def visitedAsOf(spark: SparkSession, visitedDir: String, upTo: Long): DataFrame =
    spark.read.parquet(visitedDir)
      .filter(col("shard") < upTo)
      .select(col("canonical_url"))

  /** Drains `linkStream` (AvailableNow; micro-batches of (doc_id, url)),
    * seeding the landed visited chain from `visited0` (canonical_url);
    * returns (additionsDir, visitedDir). */
  def drain(spark: SparkSession, visited0: DataFrame,
      linkStream: DataFrame, dir: String): (String, String) = {
    val additionsDir = s"$dir/additions"
    val visitedDir = s"$dir/visited"
    visited0.select(col("canonical_url"))
      .write.mode("overwrite").parquet(s"$visitedDir/shard=-1")
    val q = linkStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val vis = visitedAsOf(spark, visitedDir, batchId)
        // additions consumed twice (landed result + visited keys):
        // checkpoint so the bloom/semi adjudication runs once
        val adds = graft.ops.Frontier.additions(vis, batch.toDF())
          .localCheckpoint(true)
        adds.write.mode("overwrite").parquet(s"$additionsDir/shard=$batchId")
        adds.select(col("canonical_url"))
          .write.mode("overwrite").parquet(s"$visitedDir/shard=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    (additionsDir, visitedDir)
  }
}
