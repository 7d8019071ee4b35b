package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap ingestion — the sitemaps.org protocol (the public XML format
  * robots.txt's `Sitemap:` line points at), the crawl ring's SEED
  * DISCOVERY step: a host's sitemap lists the pages it wants crawled,
  * with optional freshness metadata; the crawler canonicalizes the
  * locations, drops what it has already visited, and feeds the rest to
  * the frontier.
  *
  * Parser contract (stated, the q193 regex-extractor honesty rule):
  * `<url>` blocks harvested with a lazy block regex, `<loc>` required,
  * `<lastmod>` optional (absent → null), unknown optional fields
  * (`<changefreq>`, `<priority>`, …) skipped by construction — the
  * extractor reads named fields, not positions. Entity decoding and
  * `<sitemapindex>` recursion are upstream concerns (a sitemap INDEX is
  * one more harvest of `<loc>` over the same machinery; locs in the
  * fixture are entity-free — the q145 canonicalizer already normalizes
  * the noisy surface forms a real sitemap carries).
  *
  * Scale shape: sitemap XML bodies are HOST-keyed but entry volume is
  * corpus-scale (50k urls per sitemap × millions of hosts), so the
  * harvest is a bounded generator fan-out + map-side regex (never a
  * shuffle), and the visited check is the q197 Frontier discipline:
  * Bloom prune in the scan stage, exact FP kill via broadcast semi/anti
  * — the standing visited set is never shuffled.
  */
object Sitemap {

  /** Harvest (host, canonical_url, lastmod) from per-host sitemap XML.
    * `lastmod` is null when the entry has none. */
  def entries(sitemaps: DataFrame, hostCol: String, xmlCol: String): DataFrame = {
    val block = explode(regexp_extract_all(col(xmlCol),
      lit("<url>(.*?)</url>"), lit(1))).as("block")
    val loc = regexp_extract(col("block"), "<loc>([^<]*)</loc>", 1)
    val lastmod = regexp_extract(col("block"), "<lastmod>([^<]*)</lastmod>", 1)
    sitemaps.select(col(hostCol).as("host"), block)
      .select(col("host"),
        UrlNormalize.canonicalUrl(loc).as("canonical_url"),
        when(length(lastmod) > 0, lastmod).as("lastmod"))
  }

  /** Entries not yet visited — the q197 adjudication shape on the seed
    * stream: Bloom prune (no false negatives — definitely-new entries
    * never touch the visited set), then the might-be-visited residue
    * (true revisits + ~fpp false positives, entry-sized) killed exactly
    * via broadcast semi + anti. Correctness never depends on the sketch;
    * fpp only moves bytes between the two paths. */
  def seeds(entries: DataFrame, visited: DataFrame,
      fpp: Double = 0.01): DataFrame = {
    val nVisited = visited.count()
    if (nVisited == 0L) return entries
    val bloom = graft.ops.BloomPrune.bloomOf(
      visited, col("canonical_url"), nVisited, fpp)
    val might = graft.ops.BloomPrune.mightContain(bloom, col("canonical_url"))
    val definiteNew = entries.filter(!might)
    val cand = entries.filter(might)
    val hits = visited.select(col("canonical_url"))
      .join(broadcast(cand.select(col("canonical_url")).distinct()),
        Seq("canonical_url"), "left_semi")
    definiteNew.unionByName(
      cand.join(broadcast(hits), Seq("canonical_url"), "left_anti"))
  }
}
