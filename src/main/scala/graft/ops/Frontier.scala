package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-frontier maintenance — the q147/q192 delta discipline applied
  * to canonical URLs: a new crawl batch's harvested links are
  * adjudicated against the STANDING visited index (canonical urls, in
  * production landed once per crawl round), and only the genuinely new
  * targets come back as frontier additions. The standing set is never
  * re-adjudicated against itself, and — the part that decides 100 TB
  * viability — never SHUFFLED: a mature crawl's links are overwhelmingly
  * already-visited, so the visited side is touched by exactly two scans
  * (a bloom build, a broadcast-semi probe) and zero exchanges.
  *
  * Shape:
  *   1. canonicalize the delta links ([[graft.text.UrlNormalize]] — one
  *      codegen projection).
  *   2. BLOOM PRUNE before the count shuffle ([[BloomPrune]], the q136
  *      sketch): links whose canonical key is definitely-not-visited
  *      (no false negatives) aggregate directly — every already-visited
  *      link drops in the scan stage, so the count exchange carries the
  *      frontier-addition mass, not the crawl's revisit mass.
  *   3. the might-be-visited residue (true revisits + ~fpp false
  *      positives on new urls) aggregates separately — delta-sized, the
  *      cost follows the batch — and is adjudicated EXACTLY: the
  *      candidate keys broadcast into a semi-join over the visited scan
  *      (answer-sized hits), and the hits broadcast back as the anti
  *      side. Correctness never depends on the sketch; fpp only moves
  *      bytes between the two paths.
  *   4. union the two aggregates: (canonical_url, n_links, min_doc) per
  *      new frontier target. A url's links land entirely on one path
  *      (the bloom verdict is a function of the key), so the counts
  *      never split.
  */
object Frontier {

  def additions(visited: DataFrame, deltaLinks: DataFrame,
      urlCol: String = "url", idCol: String = "doc_id",
      fpp: Double = 0.01): DataFrame = {
    // the canonical kernel is the md5/regex-heavy per-row stage — run it
    // cores-wide even when the links arrive at single-file parallelism.
    // The canonical projection LANDS (lazy checkpoint, r16): both
    // aggregate branches below consume it, and without truncation each
    // re-ran the kernel AND the balancing shuffle (the projection is
    // slim delta-sized rows — id + canonical url — the same size class
    // as the batch itself; the two-branch SHAPE stays, because merging
    // the aggregates would shuffle the revisit mass at 100 TB).
    val canon0 = Par.balanced(deltaLinks.select(col(idCol), col(urlCol)))
      .select(col(idCol),
        graft.text.UrlNormalize.canonicalUrl(col(urlCol)).as("canonical_url"))
    // (streaming inputs pass through un-landed: checkpoint would throw at
    // plan time — the Par.balanced guard's contract, kept consistent here;
    // streaming callers adjudicate per micro-batch inside foreachBatch)
    val canon =
      if (deltaLinks.isStreaming) canon0 else canon0.localCheckpoint(false)
    def agg(links: DataFrame): DataFrame = links
      .groupBy("canonical_url")
      .agg(count(lit(1)).cast("long").as("n_links"),
        min(col(idCol)).as("min_doc"))

    val nVisited = visited.count()
    if (nVisited == 0L) return agg(canon) // empty index: everything is new

    val bloom = BloomPrune.bloomOf(visited, col("canonical_url"), nVisited, fpp)
    val might = BloomPrune.mightContain(bloom, col("canonical_url"))
    val definiteNew = agg(canon.filter(!might))
    val candidates = agg(canon.filter(might))
    // exact FP kill with the visited side never shuffled: candidate keys
    // (delta-sized) broadcast over the visited scan; the hits (≈ the true
    // revisits among the candidates, still delta-sized) broadcast back
    val hits = visited.select("canonical_url")
      .join(broadcast(candidates.select("canonical_url")),
        Seq("canonical_url"), "left_semi")
    val fpNew = candidates.join(broadcast(hits), Seq("canonical_url"), "left_anti")
    definiteNew.unionByName(fpNew)
  }
}
