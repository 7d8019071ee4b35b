package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Host-level corpus adjudication — the PER-DOMAIN rollup the public web
  * recipes run between per-document filtering and the blocklist gate:
  * RefinedWeb (Penedo et al. '23 §3.1) and Dolma aggregate per-document
  * quality verdicts BY HOST and ban hosts whose documents are
  * predominantly junk, because spam concentrates by origin — a domain
  * serving 95% boilerplate pages is evidence against its remaining 5%
  * that no per-document signal sees. The discovered ban table is exactly
  * what the q212 blocklist gate ENFORCES downstream: this operator is
  * where that list comes from.
  *
  * Shape: ONE map-side-combined aggregate over the corpus (count + two
  * sums per host — partial_count/partial_sum combine before the shuffle,
  * so the exchange carries hosts, not documents), output answer-sized
  * (the host vocabulary). The fractions are one IEEE division of two
  * exact longs each — engine-portable (the q48 integer-ratio rule) — and
  * the ban verdict is a threshold on that exact ratio. In production the
  * banned-host table is dimension-sized by nature and broadcasts back
  * over the corpus as the q212 gate; at 100 TB the rollup is the same
  * one aggregate, skew-immune because partial aggregation absorbs even a
  * million-document host map-side.
  */
object HostStats {

  /** Lowercased host of `url`, default port and leading `www.` stripped
    * (the [[graft.text.UrlNormalize]] authority rules, host-only): the
    * rollup key. Host-level on purpose — subdomains stay distinct
    * (ads.example.com and docs.example.com earn separate verdicts);
    * collapsing to a registered domain is a public-suffix-list policy
    * layered on top, not a normalization. */
  def hostOf(url: Column): Column = {
    val auth = lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noPort = regexp_replace(auth, ":[0-9]+$", "")
    regexp_replace(noPort, "^www\\.", "")
  }

  /** The rollup's SUM-mergeable sufficient statistic: per host the doc
    * count, flagged count, and total chars — counts over a union of
    * corpora merge by addition, which is what makes the rollup
    * stream-maintainable ([[graft.streaming.StreamingHostStats]]) and
    * shard-parallel (per-crawl-shard partials sum into the fleet view). */
  def hostCounts(docs: DataFrame, urlCol: String, flagCol: String,
      textCol: String): DataFrame =
    docs
      .select(hostOf(col(urlCol)).as("host"),
        col(flagCol).cast("long").as("flagged"),
        length(col(textCol)).cast("long").as("n_chars"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("flagged")).as("n_flagged"),
        sum(col("n_chars")).as("sum_chars"))

  /** Verdicts from a (possibly merged) counts table: flagged fraction
    * (one IEEE division of two exact longs) and the ban verdict. */
  def verdictsFrom(counts: DataFrame, banAbove: Double = 0.5): DataFrame =
    counts
      .withColumn("flag_frac",
        col("n_flagged").cast("double") / col("n_docs").cast("double"))
      .withColumn("banned", col("flag_frac") > banAbove)

  /** Per-host rollup of per-document verdicts: n_docs, n_flagged (sum of
    * `flagCol`, a 0/1 per-doc junk verdict from any upstream filter),
    * total chars, flagged fraction, and the ban verdict at `banAbove`.
    * One aggregate, answer-sized output. */
  def rollup(docs: DataFrame, urlCol: String, flagCol: String,
      textCol: String, banAbove: Double = 0.5): DataFrame =
    verdictsFrom(hostCounts(docs, urlCol, flagCol, textCol), banAbove)
}
