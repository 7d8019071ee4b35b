package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the supervised langid model — the
  * landed-artifact discipline (q215/q222/q225/q228) applied to the
  * char-trigram NB fit: its sufficient statistics are the per-(lang,
  * bucket) trigram histogram (≤ |langs|·buckets rows) and the per-lang
  * seed doc count, and BOTH merge by ADDITION — so a labeled-seed
  * ingest stream lands one histogram partial + one prior partial per
  * micro-batch (shard = batch id, idempotent overwrite under
  * at-least-once foreachBatch; arbitrary shuffled replay) and the
  * release model is the shard SUM-merge. Nothing in streaming state;
  * restart resumes from whatever landed; state CONSTANT-bounded per
  * language. Every fitted model this engine produces stays
  * stream-maintained: LM (q215), DSIR (q222), quality classifier
  * (q225), component map (q228), langid (here).
  */
object StreamingLangid {

  /** Drains `seedStream` (AvailableNow; labeled docs), landing
    * per-batch (lang, f, c) histogram partials under `dir`/hist and
    * (lang, n_docs) prior partials under `dir`/prior; returns `dir`. */
  def landCounts(spark: SparkSession, seedStream: DataFrame,
      textCol: String, langCol: String, dir: String,
      buckets: Int = 4096): String = {
    val q = seedStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // the trigram fit is the cpu-heavy stage (one md5 per gram) —
        // rebalance an under-parallel batch before fanning out grams
        // (see EventsStream.rebalanced; measured 68 → 21.5 s at 150k)
        val b = EventsStream.rebalanced(batch.toDF())
        graft.ops.TrainingPrep.langidSeedCounts(b, textCol, langCol, buckets)
          .write.mode("overwrite").parquet(s"$dir/hist/shard=$batchId")
        graft.ops.TrainingPrep.langidPriorCounts(b, langCol)
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
      .groupBy(col("lang"), col("f")).agg(sum(col("c")).as("c"))

  /** The release prior from the landed partials alone. */
  def mergedPrior(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/prior")
      .groupBy(col("lang")).agg(sum(col("n_docs")).as("n_docs"))
}
