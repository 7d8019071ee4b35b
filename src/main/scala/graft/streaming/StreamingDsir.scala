package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the DSIR feature distributions — the
  * landed-artifact discipline (q191/q198/q213/q215) applied to the
  * importance-resampling model: DSIR's sufficient statistic is the
  * per-bucket (c_raw, c_tgt) histogram pair over a FIXED hashed-feature
  * vocabulary, and counts over a union of batches merge by ADDITION —
  * so an ingest stream lands one ≤`buckets`-row partial per micro-batch
  * (shard = batch id, idempotent overwrite under at-least-once
  * foreachBatch) and the release distributions are the SUM-merge of the
  * landed shards. No batch's documents are re-read to refresh the
  * model; nothing lives in streaming state; a restart resumes from
  * whatever landed.
  *
  * The partial is bounded by the bucket count — CONSTANT in the batch,
  * stronger than StreamingLm's Heaps-sublinear vocabulary partial: a
  * 100 TB ingest's landed chain is batches × 1024 rows, and the merge
  * never grows past 1024. */
object StreamingDsir {

  /** Drains `docsStream` (AvailableNow), landing per-batch
    * (f, c_raw, c_tgt) histogram partials under `dir`; returns `dir`. */
  def landCounts(spark: SparkSession, docsStream: DataFrame,
      textCol: String, idCol: String, isTarget: org.apache.spark.sql.Column,
      dir: String, buckets: Int = 1024): String = {
    val q = docsStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // hashed-bigram counting is md5-per-feature — rebalance an
        // under-parallel batch before the fit (EventsStream.rebalanced)
        graft.ops.TrainingPrep
          .dsirCounts(EventsStream.rebalanced(batch.toDF()), textCol,
            idCol, isTarget, buckets)
          .write.mode("overwrite").parquet(s"$dir/shard=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    dir
  }

  /** The release histogram from the landed partials alone: SUM-merge
    * the shard counts (map-side combined over the ≤`buckets` keys). */
  def mergedCounts(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("f")).agg(
        sum(col("c_raw")).as("c_raw"),
        sum(col("c_tgt")).as("c_tgt"))
}
