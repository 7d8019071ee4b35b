package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the Naive-Bayes quality classifier — the
  * landed-artifact discipline (q215/q222) applied to the FIT: the
  * classifier's sufficient statistics are the per-bucket (c_pos, c_neg)
  * seed histogram (≤ buckets rows) and the one-row (n_pos, n_neg) prior
  * count, and BOTH merge by ADDITION — so an ingest stream (labeled
  * seed docs arriving with the corpus, the production labeling flow)
  * lands one histogram partial + one prior partial per micro-batch
  * (shard = batch id, idempotent overwrite under at-least-once
  * foreachBatch) and the release model is the SUM-merge of the shards.
  * No batch re-read, nothing in streaming state, restart resumes from
  * whatever landed; state is CONSTANT-bounded (the q222 argument).
  */
object StreamingNb {

  /** Drains `docsStream` (AvailableNow), landing per-batch seed
    * histogram partials under `dir`/hist and prior partials under
    * `dir`/prior; returns `dir`. */
  def landCounts(spark: SparkSession, docsStream: DataFrame,
      textCol: String, idCol: String, isPos: Column, isNeg: Column,
      dir: String, buckets: Int = 1024): String = {
    val q = docsStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // hashed-feature counting is md5-per-token — rebalance an
        // under-parallel batch before the fit (EventsStream.rebalanced)
        val b = EventsStream.rebalanced(batch.toDF())
        graft.ops.TrainingPrep
          .nbSeedCounts(b, textCol, idCol, isPos, isNeg, buckets)
          .write.mode("overwrite").parquet(s"$dir/hist/shard=$batchId")
        graft.ops.TrainingPrep.nbPriorCounts(b, isPos, isNeg)
          .write.mode("overwrite").parquet(s"$dir/prior/shard=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    dir
  }

  /** The release histogram from the landed partials alone. */
  def mergedCounts(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/hist")
      .groupBy(col("f")).agg(
        sum(col("c_pos")).as("c_pos"),
        sum(col("c_neg")).as("c_neg"))

  /** The release prior from the landed partials alone (one row). */
  def mergedPrior(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/prior")
      .agg(sum(col("n_pos")).as("n_pos"), sum(col("n_neg")).as("n_neg"))
}
