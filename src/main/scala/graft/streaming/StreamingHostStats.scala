package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the host-level adjudication rollup — the
  * landed-artifact discipline (q215/q222/q225/q232) applied to
  * [[graft.ops.HostStats]]: the rollup's sufficient statistic is the
  * per-host (n_docs, n_flagged, sum_chars) count triple and counts over
  * a union of batches merge by ADDITION, so the crawl ingest lands one
  * host-vocabulary-bounded partial per micro-batch (shard = batch id,
  * idempotent overwrite under at-least-once foreachBatch — the partial
  * is a pure function of the batch) and the release verdicts derive
  * from the SUM-merge of the landed shards. This is how the ban list
  * actually gets discovered in production: per-crawl-shard partials
  * sum into the fleet-wide host view without any batch's documents
  * being re-read; nothing lives in streaming state; a restart resumes
  * from whatever landed.
  *
  * The partial is bounded by the batch's HOST vocabulary (the Heaps-
  * sublinear class, like StreamingLm's bigram partials — hosts repeat
  * far more than they multiply), and the merge never exceeds the
  * corpus host vocabulary — the answer's own size.
  */
object StreamingHostStats {

  /** Drains `docsStream` (AvailableNow; carrying `urlCol`, `flagCol`,
    * `textCol`), landing per-batch host-count partials under `dir`;
    * returns `dir`. */
  def landCounts(spark: SparkSession, docsStream: DataFrame,
      urlCol: String, flagCol: String, textCol: String, dir: String): String = {
    val q = docsStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.ops.HostStats
          .hostCounts(batch.toDF(), urlCol, flagCol, textCol)
          .write.mode("overwrite").parquet(s"$dir/shard=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    dir
  }

  /** The release counts from the landed partials alone: SUM-merge the
    * shard triples (map-side combined over the host vocabulary). */
  def mergedCounts(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("host")).agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("n_flagged")).as("n_flagged"),
        sum(col("sum_chars")).as("sum_chars"))
}
