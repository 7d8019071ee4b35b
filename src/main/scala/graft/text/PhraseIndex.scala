package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Positional n-gram phrase indexing — exact multi-word phrase search
  * over a document corpus. A substring scan (`LIKE '%a b c%'`) reads
  * every byte of every document per query; the positional index is
  * built ONCE (the write-once amortization: one pass, shuffled by
  * doc), and a phrase query then touches only the postings of the
  * phrase's own n-gram — at 100 TB that is an index-range read, not a
  * corpus scan. The adjacency construction is the standard positional-
  * postings formulation (token at pos, next at pos+1, ...), expressed
  * as per-doc `lead` windows instead of positional self-joins: one
  * shuffle on doc id, streaming within each doc, no join at all.
  *
  * Tokenization is the corpus convention ([[TextAnalysis.normalize]] +
  * single-space split — the q89/q97 protocol), so phrase semantics are
  * whitespace-token phrases, engine-portable, and counts are integers.
  */
object PhraseIndex {

  /** All n-token phrase occurrences: (id, phrase, n_occ). Documents
    * shorter than `n` tokens contribute nothing. */
  def phraseCounts(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    require(n >= 2, "a phrase has at least 2 tokens")
    val toks = docs
      .select(col(idCol), posexplode(split(TextAnalysis.normalize(col(textCol)), " ", -1))
        .as(Seq("pos", "tok")))
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val parts = col("tok") +: (1 until n).map(i => lead(col("tok"), i).over(w))
    toks
      .withColumn("__last", parts.last)
      .withColumn("phrase", concat_ws(" ", parts: _*))
      .filter(col("__last").isNotNull) // window tail: incomplete n-gram
      .groupBy(col(idCol), col("phrase"))
      .agg(count(lit(1)).as("n_occ"))
  }

  /** The corpus-wide most frequent n-token phrase (ties to the
    * lexicographically smallest) and every document containing it:
    * (phrase, id, n_occ). The shape of "what is trending verbatim" —
    * boilerplate discovery, template detection, meme tracking. */
  def topPhraseDocs(docs: DataFrame, textCol: String, idCol: String, n: Int): DataFrame = {
    val counts = phraseCounts(docs, textCol, idCol, n)
      .localCheckpoint(true) // consumed twice: top-1 pick + the filter
    val top = counts.groupBy(col("phrase"))
      .agg(sum(col("n_occ")).as("total"))
      .orderBy(col("total").desc, col("phrase"))
      .limit(1)
      .select(col("phrase"))
    counts.join(broadcast(top), "phrase")
      .select(col("phrase"), col(idCol), col("n_occ"))
  }
}
