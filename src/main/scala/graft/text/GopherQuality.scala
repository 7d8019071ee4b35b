package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher quality battery — the NON-repetition half of Rae et al. 2021
  * Table A1 ([[GopherRepetition]] is the repetition half): document-level
  * keep rules over word counts, word shapes, symbol noise, list/ellipsis
  * lines, and stop-word presence. All fractions in integer micro-units
  * (floor), the house integer-exact oracle discipline.
  *
  * Rules (published thresholds):
  *   - 50 ≤ word count ≤ 100,000
  *   - 3 ≤ mean word length ≤ 10
  *   - symbol-to-word ratio ≤ 0.1 (`#` characters and `...` ellipses)
  *   - ≤ 10% of lines start a bullet (`•` / `- `); ≤ 30% end in `...`
  *   - ≥ 80% of words contain at least one alphabetic character
  *   - ≥ 2 stop words (the Gopher list: the, be, to, of, and, that,
  *     have, with)
  *
  * Scale shape: per-row lambdas over the token / line arrays — ZERO
  * shuffle, the q199 cost class.
  */
object GopherQuality {

  private val StopWords = Seq("the", "be", "to", "of", "and", "that",
    "have", "with")

  /** Per-document battery over newline-separated `textCol`. Output:
    * (idCol, n_words, mean_word_len_u, symbol_ratio_u, bullet_line_u,
    * ellipsis_line_u, alpha_word_u, n_stopwords, keep). */
  def metrics(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val page = col(textCol)
    val lines = split(page, "\n", -1)
    val words = split(translate(page, "\n", " "), " ", -1)
    val stopArr = array(StopWords.map(lit): _*)
    val withCols = df.select(col(idCol), page.as("_page"),
        lines.as("_lines"), words.as("_words"))
      .withColumn("_nw", size(col("_words")).cast("long"))
      .withColumn("_nl", size(col("_lines")).cast("long"))
      // Σ word length = every non-separator character (no empty tokens
      // by fixture construction; a real pipeline normalizes whitespace
      // upstream — q193's collapse)
      .withColumn("_wchars",
        length(translate(col("_page"), " \n", "")).cast("long"))
      .withColumn("_nhash",
        (length(col("_page")) -
          length(call_function("replace", col("_page"), lit("#"), lit(""))))
          .cast("long"))
      .withColumn("_nell",
        ((length(col("_page")) -
          length(call_function("replace", col("_page"), lit("..."), lit(""))))
          / 3).cast("long"))
      .withColumn("_nbullet", size(filter(col("_lines"),
        l => l.startsWith("•") || l.startsWith("- "))).cast("long"))
      .withColumn("_nelline", size(filter(col("_lines"),
        l => l.endsWith("..."))).cast("long"))
      .withColumn("_nalpha", size(filter(col("_words"),
        w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("_nstop", size(filter(col("_words"),
        w => array_contains(stopArr, lower(w)))).cast("long"))
    withCols.selectExpr(
      idCol,
      "_nw AS n_words",
      "(_wchars * 1000000L) DIV _nw AS mean_word_len_u",
      "((_nhash + _nell) * 1000000L) DIV _nw AS symbol_ratio_u",
      "(_nbullet * 1000000L) DIV _nl AS bullet_line_u",
      "(_nelline * 1000000L) DIV _nl AS ellipsis_line_u",
      "(_nalpha * 1000000L) DIV _nw AS alpha_word_u",
      "_nstop AS n_stopwords",
      """(_nw BETWEEN 50 AND 100000
          AND (_wchars * 1000000L) DIV _nw BETWEEN 3000000 AND 10000000
          AND ((_nhash + _nell) * 1000000L) DIV _nw <= 100000
          AND (_nbullet * 1000000L) DIV _nl <= 100000
          AND (_nelline * 1000000L) DIV _nl <= 300000
          AND (_nalpha * 1000000L) DIV _nw >= 800000
          AND _nstop >= 2) AS keep""")
  }
}
