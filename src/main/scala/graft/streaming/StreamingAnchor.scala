package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the anchor-text corpus — the q191/q201
  * landed-artifact discipline applied to
  * [[graft.text.AnchorText]]: each arriving micro-batch of crawled
  * pages lands its own (target, term, cnt) partial (shard = batch id),
  * and the corpus-level top-K is computed over the SUM-merge of
  * everything landed — never re-reading any old batch's pages.
  *
  * No ordering contract, by construction: term counts over a union of
  * batches merge by addition, which commutes — so ARBITRARY shuffled
  * replay must produce the identical final table, and the gate is the
  * batch operator's own oracle verbatim (streamed == batch). Landing is
  * idempotent under at-least-once foreachBatch: a retried batch
  * OVERWRITES its own shard=<id> directory, never appends a second
  * copy. Nothing lives in streaming state — the landed partials ARE
  * the state, addition-sized per batch, restart-safe. */
object StreamingAnchor {

  /** Drains `pagesStream` (AvailableNow), landing per-batch term-count
    * partials under `dir`; returns `dir`. */
  def landPartials(spark: SparkSession, pagesStream: DataFrame,
      htmlCol: String, dir: String): String = {
    val q = pagesStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        graft.text.AnchorText.termCounts(batch.toDF(), htmlCol)
          .write.mode("overwrite").parquet(s"$dir/shard=$batchId")
        ()
      }
      .start()
    q.awaitTermination()
    dir
  }

  /** The corpus top-`k` from the landed partials alone: SUM-merge the
    * shard counts (map-side combined — the merge input is
    * partial-sized, not page-sized), then the batch operator's own
    * heap-bounded top-K. */
  def merged(spark: SparkSession, dir: String, k: Int): DataFrame =
    graft.text.AnchorText.topK(
      spark.read.parquet(dir)
        .groupBy(col("canonical_url"), col("term"))
        .agg(sum(col("cnt")).cast("long").as("cnt")), k)
}
