package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4 line-level cleaning — the public step AFTER markup stripping
  * ([[TextExtract]]) in the C4 recipe (Raffel et al., JMLR'20 §2.2):
  * crawl-extracted prose is cleaned LINE by line, then gated PAGE by
  * page, then boilerplate lines that repeat across the corpus are
  * deduplicated keep-first. The reference's cleaning intent (its
  * null-normalize / update-by-rule import path,
  * SQL_DATA_INTEGRATION_TOOL.py:579–607) scaled to crawl text.
  *
  * Rules implemented (the published C4 set, line granularity):
  *   - line keep: non-empty, ends in terminal punctuation
  *     (`. ! ? "`), has ≥ `minWords` whitespace words, and does not
  *     contain "javascript" (case-insensitive).
  *   - page drop: any `{` or "lorem ipsum" (case-insensitive) in the
  *     RAW page (code/placeholder pages), or fewer than `minLines`
  *     lines surviving the line filters.
  *   - corpus line dedup: a surviving line that occurs ≥ `dedupMinDf`
  *     times corpus-wide is kept ONLY at its first occurrence —
  *     min (doc, line_no) — and dropped everywhere else (C4 dedups
  *     repeated three-sentence spans; the line is the natural unit
  *     once extraction is line-structured).
  *
  * Scale shape (the part that must survive 100 TB):
  *   1. line + page filters are ARRAY LAMBDAS over the split page —
  *      entirely map-side, no explode of dropped lines, no shuffle.
  *   2. dedup keys are md5(line) — fixed 32 bytes through the one
  *      corpus-linear shuffle; the per-key aggregate is
  *      count + min(struct(doc,line_no)), both map-side combinable, so
  *      a line shared by EVERY page (the nav/footer hot key) partially
  *      aggregates before it moves — no window over a hot key, no skew.
  *   3. the repeated-line set (df ≥ dedupMinDf) is ANSWER-sized — the
  *      corpus's boilerplate vocabulary, not its line count — so it
  *      broadcasts back (the [[graft.dedup.Boilerplate]] step-3
  *      precedent, same validity bound: boilerplate vocabulary ≪
  *      corpus; if a corpus ever violates it, drop the broadcast() hint
  *      and the same plan shuffles both sides).
  *   4. reassembly groups once per doc (state bounded by one page) and
  *      left-joins the page spine so a page whose every line was
  *      someone else's boilerplate still comes back (empty, like
  *      Boilerplate's zero-survivor docs).
  *
  * Returns one row per PAGE that passed the page gates:
  *   (idCol, n_lines, n_kept, clean) — surviving-line count before and
  * after corpus dedup, and the cleaned text (kept lines joined by
  * newline, in original order; empty string when nothing survives).
  */
object C4LineClean {

  /** Trimmed lines of the page that pass the C4 line-local filters. */
  def keptLines(page: Column, minWords: Int): Column =
    filter(transform(split(page, "\n", -1), l => trim(l)), t =>
      (length(t) > 0) &&
        t.rlike("[.!?\"]$") &&
        (size(split(t, " ", -1)) >= minWords) &&
        !contains(lower(t), lit("javascript")))

  /** The C4 page-level gate over the raw page + its surviving lines. */
  def pagePasses(page: Column, kept: Column, minLines: Int): Column =
    !contains(page, lit("{")) &&
      !contains(lower(page), lit("lorem ipsum")) &&
      (size(kept) >= minLines)

  def clean(docs: DataFrame, textCol: String, idCol: String,
      minWords: Int = 3, minLines: Int = 4, dedupMinDf: Int = 2): DataFrame = {
    require(minWords >= 1, "minWords must be >= 1")
    require(dedupMinDf >= 2, "dedupMinDf < 2 would drop every line")
    val kept = keptLines(col(textCol), minWords)
    val spine = docs
      .filter(pagePasses(col(textCol), kept, minLines))
      .select(col(idCol), kept.as("__lines"))

    val line = spine.select(col(idCol),
      posexplode(col("__lines")).as(Seq("line_no", "t")))

    // the boilerplate vocabulary: keys occurring >= dedupMinDf times,
    // each with its keep-first winner — answer-sized, broadcastable
    val hot = line
      .groupBy(md5(col("t")).as("h"))
      .agg(count(lit(1)).as("df"),
        min(struct(col(idCol), col("line_no"))).as("w"))
      .filter(col("df") >= lit(dedupMinDf))
      .select(col("h"), col("w").getField(idCol).as("w_id"),
        col("w").getField("line_no").as("w_line"))

    val survivors = line
      .join(broadcast(hot), md5(line("t")) === hot("h"), "left")
      .filter(col("h").isNull ||
        (col(idCol) === col("w_id") && col("line_no") === col("w_line")))

    val regrouped = survivors
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("line_no"), col("t")))),
          s => s.getField("t"))).as("clean"))

    spine.select(col(idCol), size(col("__lines")).cast("long").as("n_lines"))
      .join(regrouped, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean"), lit("")).as("clean"))
  }
}
