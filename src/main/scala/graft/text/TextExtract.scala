package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Markup-strip text extraction — the crawl-to-text step ZERO of a
  * training-data pipeline (the C4/CCNet extraction class: regex strip,
  * not a browser): drop `<script>`/`<style>` SUBTREES (content and
  * all — code and CSS are not prose), drop comments, strip remaining
  * tags, decode the five standard entities (single pass, `&amp;`
  * last — "&amp;lt;" decodes to the literal "&lt;", never twice),
  * collapse whitespace.
  *
  * Everything is a pure codegen regexp/replace chain — zero shuffle,
  * embarrassingly parallel, the same cost class as
  * [[TextAnalysis]]'s expressions. Engine-portable by construction:
  * the q193 oracle runs the identical chain in DuckDB and the md5 of
  * the cleaned text gates every regex, entity, and collapse detail.
  *
  * Contract (stated, the regex-extractor class): tags are wellformed
  * enough that attribute values do not contain '>', script/style
  * blocks close; this is the C4-grade extractor for crawl text, not
  * an HTML5 tree parser.
  */
object TextExtract {

  /** The cleaned prose of a markup document. */
  def extractText(html: Column): Column = {
    val noScript = regexp_replace(html, "(?s)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style\\b[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]*>", " ")
    val ent = replace(replace(replace(replace(replace(noTags,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&amp;"), lit("&"))
    trim(regexp_replace(ent, "\\s+", " "))
  }

  /** First `<h1>` text (raw — entities NOT decoded; callers wanting
    * prose semantics run the title through [[extractText]]). */
  def title(html: Column): Column =
    regexp_extract(html, "<h1>(.*?)</h1>", 1)
}
