package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming maintenance of the dataset card — the ingest half of the
  * q190 release story as a LIVE operator: each arriving micro-batch of
  * documents lands its two partial-card tables (cell sums + fp tallies,
  * shard = the batch id) next to the data, exactly what a 100 TB ingest
  * job does per landed batch; the release card is [[graft.ops.DatasetCard
  * .merge]] over everything landed so far, computed WITHOUT touching any
  * old batch's documents.
  *
  * No ordering contract, by construction: both partials are
  * SUM/tally-mergeable and the merge is order-free, so ARBITRARY shuffled
  * replay (the q131/q183 discipline) must land a partial set whose merge
  * equals the batch card bit-for-bit — q191's oracle is q188's verbatim.
  *
  * State shape: NOTHING lives in streaming state — the "state" is the
  * landed parquet partials themselves (the StreamMerge landed-artifact
  * discipline), so the stream holds no corpus-sized memory and a restart
  * resumes from whatever batches already landed. */
object StreamingCard {

  /** Drains `docsStream` (AvailableNow), landing per-batch partial card
    * tables under `dir`; returns (cellsDir, fpsDir) for the merge. */
  def landPartials(spark: SparkSession, docsStream: DataFrame,
      dir: String): (String, String) = {
    val cellsDir = s"$dir/cells"
    val fpsDir = s"$dir/fps"
    val q = docsStream.writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // one facts projection per batch, consumed by both partial
        // aggregations — persist so the batch source reads once
        val facts = graft.ops.DatasetCard.docFacts(batch.toDF())
          .withColumn("shard", lit(batchId))
          .persist()
        try {
          val (cells, fps) = graft.ops.DatasetCard.partialTables(facts)
          // idempotent landing: foreachBatch is at-least-once, so a
          // retried batch must REPLACE its own partials, never append a
          // second copy — each batch owns one shard=<id> directory
          // (partition discovery hands the column back on read; the
          // merge never reads an old batch's documents either way)
          cells.drop("shard").write.mode("overwrite")
            .parquet(s"$cellsDir/shard=$batchId")
          fps.drop("shard").write.mode("overwrite")
            .parquet(s"$fpsDir/shard=$batchId")
        } finally facts.unpersist()
        ()
      }
      .start()
    q.awaitTermination()
    (cellsDir, fpsDir)
  }
}
