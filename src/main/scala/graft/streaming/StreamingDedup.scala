package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Streaming exact deduplication — the ingest-time half of the dedup
  * story: a training corpus arriving as a stream (crawler output, log
  * shipper) is deduped on the normalized-text fingerprint BEFORE it ever
  * lands, so the batch dedup passes ([[graft.dedup.Dedup]]) start from a
  * corpus with no byte-identical copies.
  *
  * State is the seen-fingerprint set, which is why the watermark matters:
  * `dropDuplicatesWithinWatermark` lets the engine expire a fingerprint
  * once the event-time watermark passes its arrival + delay, keeping
  * state bounded by the dedup horizon instead of growing with the corpus
  * forever (unbounded plain `dropDuplicates` state is the classic
  * streaming-dedup OOM). Cross-horizon duplicates are the batch passes'
  * job — the two layers compose.
  */
object StreamingDedup {

  /** First arrival per normalized-text fingerprint within the watermark
    * horizon. Input needs an event-time column `tsCol`. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
      watermarkDelay: String = "1 hour"): DataFrame =
    docs.withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("fp")
}
