package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the key-normalization pass crawl dedup runs
  * BEFORE any content fingerprint: the same page arrives as
  * `HTTPS://WWW.Site.com:443/a/?utm_source=x&id=7#top` and
  * `https://site.com/a?id=7`, and a canonical form collapses them
  * without reading a byte of content (the RFC 3986 §6 semantics-
  * preserving normalizations, plus the de-facto crawl rules —
  * tracking-param removal, www-strip — that are not RFC-pure but are
  * what web-scale pipelines actually apply).
  *
  * Rules (each a pure column expression — one projection, no UDF):
  *   1. fragment dropped (never sent to the server);
  *   2. scheme and authority lowercased (RFC-safe; the PATH keeps its
  *      case — paths are case-sensitive);
  *   3. default ports stripped (`:80` for http, `:443` for https);
  *   4. a leading `www.` stripped from the host (crawl convention);
  *   5. tracking params removed — utm_*, ref, fbclid, gclid, msclkid —
  *      and the survivors byte-sorted so param order never splits a
  *      group (sort_array: exact, locale-free);
  *   6. a trailing slash on a non-root path dropped.
  * Scheme is PRESERVED: http and https may serve different content, so
  * collapsing them is a policy decision, not a normalization.
  *
  * Scale: a per-row expression chain — no shuffle, no state; the dedup
  * that follows is whatever keyed operator the caller already runs
  * (q27's exact dedup, keyed by the canonical form). Not a validator:
  * strings without a scheme ride the same chain deterministically.
  */
object UrlNormalize {

  /** Canonical form of `url` under the rules above. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // authority = scheme://host[:port] (up to the first '/' or '?')
    val auth = regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1)
    val rest = noFrag.substr(length(auth) + 1, length(noFrag))
    val noPort = regexp_replace(
      regexp_replace(lower(auth), "^(https://[^/?]*):443$", "$1"),
      "^(http://[^/?]*):80$", "$1")
    val noWww = regexp_replace(noPort, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    val qPos = instr(rest, "?")
    val path0 = when(qPos > 0, rest.substr(lit(1), qPos - 1)).otherwise(rest)
    val query0 = when(qPos > 0, rest.substr(qPos + 1, length(rest)))
      .otherwise(lit(""))
    val params = filter(split(query0, "&", -1), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|ref|fbclid|gclid|msclkid)="))
    val queryNorm = array_join(sort_array(params), "&")
    val pathNorm = when(length(path0) > 1 && path0.endsWith("/"),
      path0.substr(lit(1), length(path0) - 1)).otherwise(path0)
    concat(noWww, pathNorm,
      when(length(queryNorm) > 0, concat(lit("?"), queryNorm)).otherwise(lit("")))
  }
}
