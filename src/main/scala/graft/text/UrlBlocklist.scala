package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL blocklist adjudication — the domain-ban step of the public
  * crawl-cleaning recipes (C4 filters against the "List of Dirty,
  * Naughty…" terms; RefinedWeb and the UT1/Université Toulouse
  * blocklists ban by DOMAIN, with subdomain inheritance: `bad.example`
  * bans `ads.bad.example` but NOT `notbad.example` — the label
  * boundary is load-bearing).
  *
  * Scale shape: suffix matching is depth-bounded, not exploded — the
  * last-2-label and last-3-label suffixes are computed as plain COLUMNS
  * (blocklists are domain-level; deeper entries are vanishingly rare,
  * and the bound is an explicit parameter of the contract), each
  * LEFT-joined against the BROADCAST blocklist (dimension-sized by
  * nature — even UT1's largest category fits an executor). Zero
  * shuffles, zero fan-out: the URL corpus is adjudicated entirely
  * map-side, the q200 robots-gate cost class. The most specific match
  * wins the `matched` attribution (deterministic); any match blocks.
  */
object UrlBlocklist {

  /** Adds (host, blocked, matched) to `urls`: blocked ⇔ the host or
    * one of its label suffixes (down to 2 labels) is a blocklisted
    * domain; `matched` is the most specific blocklisted suffix, null
    * when clean. `blocklist` must have a `domain` column (lowercase). */
  def adjudicate(urls: DataFrame, blocklist: DataFrame,
      urlCol: String = "url"): DataFrame = {
    val host = lower(regexp_extract(col(urlCol),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]*)", 1))
    val withSuffixes = urls
      .withColumn("host", host)
      .withColumn("_labs", split(col("host"), "\\."))
      .withColumn("_s2", when(size(col("_labs")) >= 2,
        array_join(slice(col("_labs"), -2, 2), ".")))
      .withColumn("_s3", when(size(col("_labs")) >= 3,
        array_join(slice(col("_labs"), -3, 3), ".")))
    val b2 = broadcast(blocklist.select(col("domain").as("_d2")))
    val b3 = broadcast(blocklist.select(col("domain").as("_d3")))
    withSuffixes
      .join(b2, col("_s2") === col("_d2"), "left")
      .join(b3, col("_s3") === col("_d3"), "left")
      .withColumn("blocked", col("_d2").isNotNull || col("_d3").isNotNull)
      .withColumn("matched", coalesce(col("_d3"), col("_d2")))
      .drop("_labs", "_s2", "_s3", "_d2", "_d3")
  }
}
