package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the archive (CDX) index — the landed-artifact
  * discipline (q198 fingerprint index, q228 component map, q222/q225/q232
  * model fits) applied to [[graft.sources.Warc.cdx]]'s index, completing
  * the lifecycle q231 opened: q210 builds the CDX per run, q231 appends
  * fresh archives in batch ([[graft.sources.Warc.advanceCdx]]), and this
  * stream maintains the index as archive announcements ARRIVE — the shape
  * a fetcher fleet actually produces (each rotated `.warc.gz` shard is
  * announced once, immutable from birth).
  *
  * Each micro-batch carries archive FILE PATHS (column `file`). The batch
  * lands the CDX rows of the announced archives that no PREDECESSOR shard
  * has indexed, under an idempotent `cdx/shard=<batchId>` directory:
  *
  *   - the prune manifest is the distinct `file` set of shards
  *     `< batchId` (partition-pruned read, archive-manifest-sized collect
  *     — the same driver-side contract as [[graft.sources.Warc.advanceCdx]]
  *     and the fetch planner's file list), so a re-OFFERED archive in a
  *     later batch appends nothing;
  *   - a RETRIED batch (same id, at-least-once foreachBatch) reads the
  *     same predecessor manifest — its own possibly-half-landed shard is
  *     excluded by `shard < batchId` — recomputes the same fresh set, and
  *     OVERWRITES its shard with byte-equivalent content. Nothing lives in
  *     streaming state; a restart resumes from whatever shards landed.
  *
  * The release index is the plain UNION of the landed shards — CDX rows
  * derive from their archive alone (cdx(A ∪ B) = cdx(A) ∪ cdx(B), the
  * q231 identity) and the prune keeps shard file-sets disjoint, so merge
  * is concatenation: no fold, no fixpoint, order-free. Chained ingest ≡
  * batch [[graft.sources.Warc.advanceCdx]] ≡ one-shot build, row for row.
  *
  * Scale shape per batch: indexing walks only the batch's FRESH archives
  * (one task per archive — the per-record-gzip contract); the standing
  * side contributes one manifest-sized distinct. A long-running ingest
  * compacts the shard chain offline (rewrite shards ≤ K as one partial —
  * union-merge makes compaction a no-op semantically), the LSM discipline
  * shared by every landed-artifact stream in this package.
  */
object StreamingCdx {

  /** Drains `announceStream` (AvailableNow; column `file` — archive path
    * announcements), seeding the landed chain from `standing` (a CDX
    * DataFrame in [[graft.sources.Warc.cdxSchema]] shape, landed once as
    * `shard=-1`); returns the chain root `dir`. Batches whose announced
    * files are all already indexed land nothing (same as an empty batch). */
  def landPartials(spark: SparkSession, standing: DataFrame,
      announceStream: DataFrame, dir: String): String = {
    standing.write.mode("overwrite").parquet(s"$dir/cdx/shard=-1")
    val q = announceStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val offered = batch.toDF().select(col("file")).distinct()
          .collect().map(_.getString(0)) // announcement-batch-sized
        val seen = spark.read.parquet(s"$dir/cdx")
          .filter(col("shard") < batchId)
          .select(col("file")).distinct()
          .collect().map(_.getString(0)).toSet // archive-manifest-sized
        val fresh = offered.filterNot(seen).sorted
        if (fresh.nonEmpty) {
          graft.sources.Warc.cdx(spark, fresh.mkString(","))
            .write.mode("overwrite").parquet(s"$dir/cdx/shard=$batchId")
        }
        ()
      }
      .start()
    q.awaitTermination()
    dir
  }

  /** The release index: the union of every landed shard (disjoint by the
    * prune, so concatenation IS the merge). */
  def merged(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/cdx").drop("shard")
}
