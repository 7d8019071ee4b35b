package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.AggFunctions
import graft.text.TextAnalysis

/** Trending-token monitoring on a document ingest stream — the corpus
  * drift/poisoning canary a production training pipeline keeps running:
  * a crawl source suddenly dominated by one boilerplate phrase, a spam
  * campaign, a language shift, all surface as a token storming the
  * per-window ranking.
  *
  * Split by design into the streaming half and the batch half:
  *  - [[tokenCountsStream]] is the UNBOUNDED part — watermarked windowed
  *    token counts, state bounded by (windows in flight × vocabulary),
  *    windows finalize and leave state when the watermark passes;
  *  - [[topTokens]] ranks the LANDED counts per finalized window through
  *    the ScoredTopK bounded heap (a streaming query cannot chain a
  *    second aggregation after a windowed count in append mode — and
  *    shouldn't: ranking closed windows is a batch job over an
  *    answer-sized table).
  * Token strings travel as xxhash64 ids through the heap and join back
  * answer-sized (the q55/q72 convention).
  */
object TrendingTokens {

  /** Watermarked per-window token counts from a streaming DataFrame with
    * an event-time column. Append-mode sinks emit each (window, token)
    * row once, when the watermark closes the window. */
  def tokenCountsStream(docs: DataFrame, textCol: String, tsCol: String,
      windowLen: String = "1 hour", delay: String = "10 minutes"): DataFrame =
    docs.withWatermark(tsCol, delay)
      .select(col(tsCol),
        explode(split(TextAnalysis.normalize(col(textCol)), " ", -1)).as("tok"))
      .groupBy(window(col(tsCol), windowLen), col("tok"))
      .agg(count(lit(1)).as("n"))

  /** Top-k tokens per window over landed counts: (window, rk, tok, n). */
  def topTokens(counts: DataFrame, k: Int): DataFrame = {
    val hashed = counts.withColumn("tok_h", xxhash64(col("tok")))
    hashed.groupBy(col("window"))
      .agg(AggFunctions.scoredTopK(col("n").cast("double"), col("tok_h"), k).as("tk"))
      .select(col("window"), posexplode(col("tk")))
      .select(col("window"), (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("tok_h"), col("col.score").cast("long").as("n"))
      .join(hashed.select(col("tok"), col("tok_h")).distinct(), "tok_h")
      .select(col("window"), col("rk"), col("tok"), col("n"))
  }
}
