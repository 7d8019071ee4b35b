package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.AggFunctions
import graft.text.TextAnalysis

/** Sparse tf-idf cosine "more like this": for each query document, the
  * top-k most similar documents under tf·idf weights, candidates generated
  * through the inverted index (docs sharing at least one indexed term) —
  * the lexical companion to the dense-embedding ANN family (Ann/Ivf/IvfPq)
  * for corpora that have no embeddings yet.
  *
  * Scale design — the all-pairs trap and the MAXDF cap: joining documents
  * on shared terms degenerates on stop-words (a term in half the corpus
  * contributes n²/4 candidate pairs). The fix is part of the MODEL, not an
  * approximation: the vocabulary is capped at document frequency ≤ maxDf,
  * so a term contributes at most maxDf² pairs and the candidate volume is
  * Σ_term df² ≤ |vocab|·maxDf² — while the dropped terms are exactly the
  * lowest-idf ones (ln(N/df) → 0 as df → N), whose weight products are
  * negligible. Both engines score the same capped model, so determinism
  * is unaffected; [[droppedTerms]] is the audit view (the `droppedBuckets`
  * convention). Query-side weights broadcast (queries × terms rows); the
  * per-query top-k runs through the ScoredTopK bounded heap, no Window.
  *
  * Cross-engine float discipline (q81/q89 rule): per-term products and
  * per-term squared norms integerize to micro-units BEFORE their per-pair /
  * per-doc sums (exact long addition commutes); the final
  * num/√(na·nb) is a fixed-order chain of IEEE-exact ops on exact
  * operands, shipped as floor(·1e6).
  */
object SparseCosine {

  /** Per-document tf and capped-vocabulary idf weights: (d, tok, tf, lnidf). */
  private def weights(docs: DataFrame, textCol: String, idCol: String,
      maxDf: Long): DataFrame = {
    val tf = docs.select(col(idCol).as("d"),
        explode(split(TextAnalysis.normalize(col(textCol)), " ", -1)).as("tok"))
      .groupBy(col("d"), col("tok")).agg(count(lit(1)).as("tf"))
    val nDocs = docs.count()
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    tf.join(df, "tok")
      .select(col("d"), col("tok"), col("tf"),
        log(lit(nDocs.toDouble) / col("df")).as("lnidf"))
  }

  /** Audit view: the terms excluded by the maxDf cap, with their df —
    * answer-sized (stop-word-shaped vocabulary head). */
  def droppedTerms(docs: DataFrame, textCol: String, idCol: String,
      maxDf: Long): DataFrame =
    docs.select(col(idCol).as("d"),
        explode(split(TextAnalysis.normalize(col(textCol)), " ", -1)).as("tok"))
      .groupBy(col("d"), col("tok")).agg(count(lit(1)).as("tf"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)

  /** Top-k most-similar documents for every doc matching `queryPred`:
    * (q_id, rk, n_id, score_u) with score_u = floor(cosine·1e6). */
  def topK(docs: DataFrame, textCol: String, idCol: String,
      queryPred: Column, k: Int, maxDf: Long): DataFrame = {
    val w = weights(docs, textCol, idCol, maxDf)
    // micro-unit integerization: one floor per term occurrence, exact sums
    val n2u = w.groupBy(col("d")).agg(
      sum(floor(col("tf") * col("tf") * col("lnidf") * col("lnidf") * lit(1e6))
        .cast("long")).as("n2_u"))
    val qw = w.join(docs.filter(queryPred).select(col(idCol).as("d")), "d")
      .select(col("d").as("q"), col("tok"), col("tf").as("tfa"),
        col("lnidf").as("lnidf_q")) // same per-token value as the b side's
    val numU = broadcast(qw).join(w, "tok")
      .filter(col("q") =!= col("d"))
      .select(col("q"), col("d").as("c"),
        floor(col("tfa") * col("tf") * col("lnidf_q") * col("lnidf_q") * lit(1e6))
          .cast("long").as("p_u"))
      .groupBy(col("q"), col("c")).agg(sum(col("p_u")).as("num_u"))
    val scored = numU
      .join(n2u.withColumnRenamed("d", "q").withColumnRenamed("n2_u", "na_u"), "q")
      .join(n2u.withColumnRenamed("d", "c").withColumnRenamed("n2_u", "nb_u"), "c")
      .select(col("q"), col("c"),
        floor(col("num_u").cast("double") /
          (sqrt(col("na_u").cast("double")) * sqrt(col("nb_u").cast("double"))) * lit(1e6))
          .cast("long").as("score_u"))
    scored.groupBy(col("q"))
      .agg(AggFunctions.scoredTopK(col("score_u").cast("double"), col("c"), k).as("tk"))
      .select(col("q").as("q_id"), posexplode(col("tk")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rk"),
        col("col.id").as("n_id"), col("col.score").cast("long").as("score_u"))
  }
}
