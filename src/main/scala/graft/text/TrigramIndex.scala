package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Character-TRIGRAM inverted index — substring search without a corpus
  * scan (the pg_trgm / code-search-engine technique): a doc containing
  * pattern `p` necessarily contains every character trigram of `p`, so
  * the docs holding ALL of the pattern's trigrams are a COMPLETE
  * candidate set, and one `contains` verify per candidate replaces a
  * `LIKE '%p%'` pass over the corpus. The complement of the suite's
  * word-level indexes (q79 term postings, q110 positional phrases):
  * those need token boundaries; this one answers arbitrary substrings —
  * log fragments, identifiers, partial words.
  *
  * Scale shape: the postings build is one generator pass (distinct
  * trigrams per doc, ~|text| rows — the same volume a tokenizer emits)
  * into a (trigram, doc) table a layout pass would cluster by trigram;
  * a query touches only its own trigrams' postings (the rarest pattern
  * trigram bounds the candidate count), then candidate-sized verify.
  * Matching is case-insensitive by construction (index and verify both
  * lowercase). Patterns shorter than 3 chars have no trigram and are
  * rejected — they belong to a scan, not this index. */
object TrigramIndex {

  /** Distinct lowercased character trigrams of a string column. */
  def charTrigrams(c: Column): Column = {
    val t = lower(c)
    array_distinct(
      when(length(t) >= 3,
        transform(sequence(lit(1), length(t) - 2), i => substring(t, i, lit(3))))
        .otherwise(array().cast("array<string>")))
  }

  /** Postings table (g, id): one row per distinct (trigram, doc). */
  def build(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    graft.ops.Par.balanced(docs.select(col(idCol).as("id"), col(textCol)))
      .select(col("id"), explode(charTrigrams(col(textCol))).as("g"))

  /** Case-insensitive substring search for a literal pattern batch:
    * for each pattern, candidates = docs holding ALL its trigrams
    * (count == n distinct trigrams over the postings semi-join), then
    * one `contains` verify per candidate against the doc table.
    * Returns (pattern, id) for every (pattern ⊂ doc) match. */
  def search(postings: DataFrame, docs: DataFrame, textCol: String,
      idCol: String, patterns: Seq[String]): DataFrame = {
    require(patterns.nonEmpty, "empty pattern batch")
    patterns.foreach(p => require(p.length >= 3,
      s"pattern '$p' shorter than 3 chars — no trigram to index on"))
    val spark = docs.sparkSession
    import spark.implicits._
    val pats = patterns.map(_.toLowerCase).distinct
      .flatMap { p =>
        val gs = p.sliding(3).distinct.toSeq
        gs.map(g => (p, g, gs.size))
      }.toDF("pattern", "g", "n_need")
    val cands = postings.join(broadcast(pats), "g")
      .groupBy(col("pattern"), col("id"))
      .agg(count(lit(1)).as("n_hit"), first(col("n_need")).as("n_need"))
      .filter(col("n_hit") === col("n_need"))
      .select(col("pattern"), col("id"))
    cands
      .join(docs.select(col(idCol).as("id"), lower(col(textCol)).as("__t")), "id")
      .filter(col("__t").contains(col("pattern")))
      .select(col("pattern"), col("id"))
  }
}
