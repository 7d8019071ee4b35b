package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher repetition battery (Rae et al. 2021, "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", Table A1) — the
  * repetition-quality signals every crawl-scale corpus runs after the C4
  * line pass (q195): per-document duplicate-line fractions and duplicated /
  * top word-n-gram character fractions, with the published thresholds as
  * the keep verdict.
  *
  * Semantics follow the published reproductions (Gopher A1; the open
  * C4/Gopher reimplementation lineage):
  *   - `dup_line_u`: fraction of lines that are repeats of an earlier line.
  *   - `dup_line_char_u`: characters in duplicate lines BEYOND their first
  *     occurrence, over total line characters.
  *   - `topN_u` (n = 2, 3, 4): characters covered by the densest n-gram —
  *     max over grams of count × token-chars. (Gopher says "most frequent
  *     n-gram", which is ambiguous under count ties; max-product is the
  *     deterministic variant and equals it whenever the most frequent gram
  *     is also the densest.)
  *   - `dupN_u` (n = 5, 10): characters in ALL occurrences of duplicated
  *     n-grams (count ≥ 2), over total token characters.
  * All fractions are integer micro-units (×1e6, floor) — the repo's
  * integer-exact oracle discipline; doubles never cross the gate.
  *
  * Scale shape: every metric is a per-row projection over the token /
  * line arrays (sort + one fold per n) — ZERO shuffle, embarrassingly
  * parallel, the q34/q193 cost class; the only cost is the in-row
  * array_sort, O(len·log len) per document. Gram counting deliberately
  * never explodes: a corpus × n_tokens explode-then-groupBy would turn a
  * map-only filter into the job's largest shuffle at 100 TB.
  *
  * Units are separator-generic: lines here are `\n` splits; the paragraph
  * variant is the same fold over a `\n\n` split.
  */
object GopherRepetition {

  /** Word n-grams joined by single spaces; empty when fewer than n tokens. */
  def wordGrams(tokens: Column, n: Int): Column =
    when(size(tokens) >= n,
      transform(sequence(lit(0), size(tokens) - n),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** One fold over the SORTED gram array computing both repetition
    * statistics at once: (top = max over grams of count × charlen,
    * dup = Σ over grams with count ≥ 2 of (count − dupBase) × charlen)
    * where charlen = length(gram) − sepChars. Lines pass dupBase = 1
    * (repeats beyond the first); word grams pass dupBase = 0 (all
    * occurrences). Returns a struct column (top, dup), both BIGINT. */
  def repStats(units: Column, sepChars: Int, dupBase: Int): Column = {
    val sorted = array_sort(units)
    // cnt = 0 makes the init prev value irrelevant: the first element gets
    // cnt 1 whether it "matches" prev or not, and the cnt-0 run it closes
    // contributes nothing to dup
    val init = struct(lit(" ").as("prev"), lit(0L).as("cnt"),
      lit(0L).as("top"), lit(0L).as("dup"))
    def charlen(x: Column) = (length(x) - lit(sepChars)).cast("long")
    def dupTerm(prev: Column, cnt: Column) =
      when(cnt >= 2L, (cnt - lit(dupBase.toLong)) * charlen(prev))
        .otherwise(lit(0L))
    aggregate(sorted, init,
      (acc, x) => {
        val same = acc.getField("prev") === x
        val cnt = when(same, acc.getField("cnt") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), cnt.as("cnt"),
          greatest(acc.getField("top"), cnt * charlen(x)).as("top"),
          (acc.getField("dup") +
            when(same, lit(0L))
              .otherwise(dupTerm(acc.getField("prev"), acc.getField("cnt"))))
            .as("dup"))
      },
      acc => struct(acc.getField("top").as("top"),
        (acc.getField("dup") +
          dupTerm(acc.getField("prev"), acc.getField("cnt"))).as("dup")))
  }

  /** Full per-document battery over `textCol` (newline-separated page
    * text). Output: (idCol, n_lines, dup_line_u, dup_line_char_u, top2_u,
    * top3_u, top4_u, dup5_u, dup10_u, keep) — fractions in micro-units,
    * keep = the Gopher A1 thresholds (0.30 / 0.20 / 0.20 / 0.18 / 0.16 /
    * 0.15 / 0.10). */
  def metrics(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val page = col(textCol)
    val lines = split(page, "\n", -1)
    val toks = split(translate(page, "\n", " "), " ", -1)
    val withStats = df.select(col(idCol), page.as("_page"),
        lines.as("_lines"), toks.as("_toks"))
      // denominators precomputed in the DSL (Scala "\n" = the newline
      // char) so the selectExpr strings below stay escape-free
      .withColumn("_wchars",
        greatest(length(translate(col("_page"), " \n", "")), lit(1)).cast("long"))
      .withColumn("_lchars",
        greatest(length(col("_page")) - size(col("_lines")) + 1, lit(1)).cast("long"))
      .withColumn("_lstats", repStats(col("_lines"), sepChars = 0, dupBase = 1))
      .withColumn("_s2", repStats(wordGrams(col("_toks"), 2), 1, 0))
      .withColumn("_s3", repStats(wordGrams(col("_toks"), 3), 2, 0))
      .withColumn("_s4", repStats(wordGrams(col("_toks"), 4), 3, 0))
      .withColumn("_s5", repStats(wordGrams(col("_toks"), 5), 4, 0))
      .withColumn("_s10", repStats(wordGrams(col("_toks"), 10), 9, 0))
    withStats.selectExpr(
      idCol,
      "CAST(size(_lines) AS BIGINT) AS n_lines",
      "((size(_lines) - size(array_distinct(_lines))) * 1000000L) DIV size(_lines) AS dup_line_u",
      "(_lstats.dup * 1000000L) DIV _lchars AS dup_line_char_u",
      "(_s2.top * 1000000L) DIV _wchars AS top2_u",
      "(_s3.top * 1000000L) DIV _wchars AS top3_u",
      "(_s4.top * 1000000L) DIV _wchars AS top4_u",
      "(_s5.dup * 1000000L) DIV _wchars AS dup5_u",
      "(_s10.dup * 1000000L) DIV _wchars AS dup10_u",
      """NOT (
         ((size(_lines) - size(array_distinct(_lines))) * 1000000L) DIV size(_lines) > 300000 OR
         (_lstats.dup * 1000000L) DIV _lchars > 200000 OR
         (_s2.top * 1000000L) DIV _wchars > 200000 OR
         (_s3.top * 1000000L) DIV _wchars > 180000 OR
         (_s4.top * 1000000L) DIV _wchars > 160000 OR
         (_s5.dup * 1000000L) DIV _wchars > 150000 OR
         (_s10.dup * 1000000L) DIV _wchars > 100000
       ) AS keep""")
  }
}
