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
  * Token strings travel as dense integer ids through the heap and join
  * back answer-sized (the q55/q72 convention, with ids chosen so ties
  * rank deterministically — see [[topTokens]]).
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

  /** Top-k tokens per window over landed counts: (window, rk, tok, n).
    *
    * Determinism: ScoredTopK breaks score ties by SMALLER id, so the
    * token id is its global ALPHABETICAL dense rank — the ranking is then
    * exactly `row_number() over (order by n desc, tok)`, replicable by
    * any SQL oracle (a hash id would tie-break in hash order, q97's
    * driver check would flake on equal counts). The rank window is a
    * single-task sort of the DISTINCT vocabulary — Heaps-sublinear, the
    * same answer-shaped class as q55's global rank; the landed counts
    * table it feeds is already the stream's finalized output, not the
    * corpus. */
  def topTokens(counts: DataFrame, k: Int): DataFrame = {
    // tok_v, not tok: the rename gives vocab's output fresh attributes,
    // so joining it back against its own source never puts one exprId in
    // both join outputs (a memory-sink View is not re-instantiable — the
    // analyzer cannot deduplicate a self-join over it)
    val vocab = counts.select(col("tok").as("tok_v")).distinct()
      .withColumn("tok_h", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("tok_v"))).cast("long"))
    val hashed = counts.join(vocab, col("tok") === col("tok_v")).drop("tok_v")
    hashed.groupBy(col("window"))
      .agg(AggFunctions.scoredTopK(col("n").cast("double"), col("tok_h"), k).as("tk"))
      .select(col("window"), posexplode(col("tk")))
      .select(col("window"), (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("tok_h"), col("col.score").cast("long").as("n"))
      .join(vocab, "tok_h")
      .select(col("window"), col("rk"), col("tok_v").as("tok"), col("n"))
  }
}
