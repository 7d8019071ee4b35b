package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Anchor-text harvesting — the TEXT half of the link boundary
  * ([[graft.ops]] q194 harvests the hrefs; this collects what the
  * linking pages SAY about each target). Per canonical target URL: the
  * top-K anchor terms by occurrence count — the classic link-context
  * signal (anchor-text corpora are a standard public training/ranking
  * resource, e.g. the MS MARCO anchor sets; search engines have ranked
  * on it since Brin & Page 1998 §2.2).
  *
  * Scale shape: `<a …>…</a>` elements fan out through one bounded
  * generator; href extraction, inner-markup strip, canonicalization
  * (the q145 chain), and term split are all map-side; term counts
  * aggregate ONCE with a map-side combine on (target, term); the
  * per-target top-K runs through the `scored_top_k` BOUNDED HEAP — a
  * hub page with a million distinct anchor terms reduces to K entries
  * per map task before anything shuffles, never a rank window funneling
  * a hot target's whole vocabulary into one sort task (the q202
  * discipline). Terms ride the heap as md5-prefix longs (the q185
  * house convention; ties prefer the smaller hash — deterministic in
  * both engines) and the heap's winners join back to the counts table
  * on the SAME (target, tid) key — the counts table is never
  * re-aggregated and never windowed.
  */
object AnchorText {

  /** (canonical_url, term, cnt): the harvested, canonicalized,
    * SUM-mergeable term-count table — the map-side half, and the
    * partial a streaming ingest lands per batch (counts over a union
    * of batches merge by addition, order-free). */
  def termCounts(docs: DataFrame, htmlCol: String): DataFrame = {
    val snips = docs.select(
      explode(regexp_extract_all(col(htmlCol),
        lit("(?s)<a [^>]*>.*?</a>"), lit(0))).as("a"))
    val pairs = snips.select(
      UrlNormalize.canonicalUrl(
        regexp_extract(col("a"), "href=\"([^\"]*)\"", 1)).as("canonical_url"),
      TextAnalysis.normalize(regexp_replace(
        regexp_extract(col("a"), "(?s)^<a [^>]*>(.*)</a>$", 1),
        "<[^>]*>", " ")).as("anchor"))
    pairs
      .select(col("canonical_url"), explode(split(col("anchor"), " ", -1)).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("canonical_url"), col("term"))
      .agg(count(lit(1)).cast("long").as("cnt"))
  }

  /** The per-target top-`k` over any (canonical_url, term, cnt) table
    * — heap-bounded, never a rank window. */
  def topK(counts0: DataFrame, k: Int): DataFrame = {
    val counts = counts0.withColumn("tid", pmod(
      conv(substring(md5(concat(lit("anc:"), col("term"))), 1, 15), 16, 10)
        .cast("long"), lit(1152921504606846976L)))
    val topk = counts.groupBy(col("canonical_url"))
      .agg(graft.functions.AggFunctions
          .scoredTopK(col("cnt").cast("double"), col("tid"), k).as("top"),
        count(lit(1)).cast("long").as("n_terms"))
      .select(col("canonical_url"), col("n_terms"),
        posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("canonical_url"), col("n_terms"),
        (col("pos") + 1).cast("long").as("rk"), col("e.id").as("tid"))
    // winners join back on the SAME key the counts table is already
    // hashed by — no re-aggregation, no window over the counts
    counts.join(topk, Seq("canonical_url", "tid"))
      .select(col("canonical_url"), col("rk"), col("term"), col("cnt"),
        col("n_terms"))
  }

  /** (canonical_url, rk, term, cnt, n_terms): the top-`k` anchor terms
    * per canonical target plus the target's distinct-term count.
    * Empty anchors contribute no terms. */
  def topTerms(docs: DataFrame, htmlCol: String, k: Int): DataFrame =
    topK(termCounts(docs, htmlCol), k)
}
