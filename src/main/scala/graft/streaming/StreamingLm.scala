package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the bigram language model — the landed-
  * artifact discipline (q190/q191/q213) applied to the MODEL itself:
  * the MLE bigram model's sufficient statistic is a (bg, c12) count
  * table, and counts over a union of batches merge by ADDITION — so an
  * ingest stream lands one count partial per micro-batch (shard =
  * batch id, idempotent overwrite under at-least-once foreachBatch)
  * and the release model is the SUM-merge of the landed shards. No
  * batch's documents are ever re-read to refresh the model; nothing
  * lives in streaming state; a restart resumes from whatever landed.
  *
  * The count partial is vocabulary-sized (Heaps-sublinear in the
  * batch), so a mature ingest's landed chain is far smaller than the
  * corpus it summarizes — the property that makes "the LM as a
  * maintainable artifact" viable at 100 TB (compact the shard chain
  * offline when it grows long, the q198 LSM note). */
object StreamingLm {

  /** Drains `docsStream` (AvailableNow), landing per-batch (bg, c12)
    * partials under `dir`; returns `dir`. */
  def landCounts(spark: SparkSession, docsStream: DataFrame,
      textCol: String, idCol: String, dir: String): String = {
    val q = docsStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // bigram counting is md5-per-token — rebalance an under-parallel
        // batch before the fit (see EventsStream.rebalanced)
        graft.ops.TrainingPrep.bigramCounts(
            EventsStream.rebalanced(batch.toDF()), textCol, idCol)
          .write.mode("overwrite").parquet(s"$dir/shard=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    dir
  }

  /** The release model from the landed partials alone: SUM-merge the
    * shard counts (map-side combined over the vocabulary key). */
  def mergedModel(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(col("bg")).agg(sum(col("c12")).as("c12"))
}
