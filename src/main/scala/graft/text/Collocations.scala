package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation (statistical phrase) mining — the corpus-level "which
  * token pairs belong together" signal (Church & Hanks, "Word
  * Association Norms, Mutual Information, and Lexicography", CL 1990):
  * rank adjacent bigrams by pointwise mutual information,
  * PMI(x,y) = ln( P(x,y) / (P(x)·P(y)) ). The tokenizer-prep
  * complement of [[Bpe]] (whose merge objective is raw pair frequency
  * — PMI surfaces "new york" even when both words are individually
  * rare) and of [[PhraseIndex]] (which finds the most FREQUENT phrase;
  * this finds the most ASSOCIATED ones).
  *
  * Cross-engine exactness: the score shipped is the LIFT ratio
  * c_xy·B / (c_x·c_y) (B = total bigram count) rather than its log —
  * ln implementations differ in the last ulp across engines, but ln is
  * monotone, so ranking by lift IS ranking by PMI, and the lift is a
  * fixed-order chain (double multiply + two divisions) over EXACT
  * integer counts — bit-identical on any IEEE engine.
  *
  * Scale shape: one token explode (linear) + one bigram explode
  * (linear) feed two partial-aggregated groupBys; the scored table is
  * observed-bigram-sized (Heaps-sublinear in the corpus), joined to the
  * vocab-sized unigram counts by equi-joins; B travels as a 1-row
  * broadcast (the q80 convention — the 1-row BNLJ is the intended
  * plan); the top-k is an answer-sized ordered limit. `minCount` is the
  * standard hapax guard — PMI of a count-1 bigram is noise.
  */
object Collocations {

  /** Top-k adjacent-bigram collocations by PMI (shipped as lift):
    * (bigram, n_xy, n_x, n_y, lift), lift desc / bigram tie-break. */
  def pmiTopK(docs: DataFrame, textCol: String, minCount: Long = 5L,
      k: Int = 50): DataFrame = {
    val toks = docs
      .select(split(TextAnalysis.normalize(col(textCol)), " ", -1).as("t"))
    val uni = toks.select(explode(col("t")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
    val bi = toks.filter(size(col("t")) >= 2)
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    val cb = bi.groupBy("bg").agg(count(lit(1)).as("n_xy"))
      .filter(col("n_xy") >= minCount)
    val tot = bi.agg(count(lit(1)).as("nb"))
    cb.withColumn("w1", split(col("bg"), " ").getItem(0))
      .withColumn("w2", split(col("bg"), " ").getItem(1))
      .join(uni.select(col("tok").as("w1"), col("c").as("n_x")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("n_y")), "w2")
      .crossJoin(broadcast(tot))
      .select(col("bg").as("bigram"), col("n_xy"), col("n_x"), col("n_y"),
        (col("n_xy").cast("double") * col("nb") / col("n_x") / col("n_y"))
          .as("lift"))
      .orderBy(col("lift").desc, col("bigram"))
      .limit(k)
  }
}
