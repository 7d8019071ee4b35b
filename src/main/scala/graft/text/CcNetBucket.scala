package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CCNet-style perplexity bucketing (Wenzek et al., LREC 2020): score
  * every document with a per-LANGUAGE bigram-LM perplexity, then split
  * each language's distribution into `head` / `middle` / `tail` at its
  * terciles — the public recipe's quality triage step (CCNet keeps head
  * +middle for LM training; the tail is the noisy crawl residue).
  *
  * The LM is the corpus's own per-language MLE bigram model (the
  * [[graft.ops.TrainingPrep.bigramLmScore]] model partitioned by
  * language — CCNet trains per-language KenLM models; the bigram MLE is
  * this engine's from-scratch stand-in, same scoring algebra). Per-
  * bigram log-probs integerize to micro-nats BEFORE the per-doc sum
  * (exact long addition commutes — the q89 rule), and per-doc
  * perplexity surfaces as integer micro-nats-per-bigram:
  * `ppl_u = (−ll_u) div n_bigrams` — monotone in true perplexity
  * exp(−ll/n), so tercile CUTS on ppl_u are tercile cuts on perplexity.
  *
  * Scale shape (the part CCNet's paper hand-waves and a 100 TB run
  * cannot): the tercile cutoffs are NOT a corpus sort. Per-doc ppl_u
  * coarsens to fixed-width histogram bins; bin counts aggregate with a
  * map-side combine (the only corpus-keyed exchange past the LM build),
  * the cumulative walk runs over the ANSWER-SIZED (lang × bin) table,
  * and the two cut bins per language broadcast back onto the doc
  * stream. A bin holds ~`binWidth` micro-nats of resolution — cuts land
  * on bin boundaries, deterministic in both engines, and the histogram
  * never funnels the corpus into one sort task the way an ntile window
  * would.
  */
object CcNetBucket {

  /** Per-doc: (id, lang, n_bigrams, ppl_u, bucket). Docs with < 2
    * tokens have no bigrams and emit no row (deterministic in both
    * engines). */
  def buckets(docs: DataFrame, textCol: String, idCol: String,
      langCol: String, binWidth: Long = 1000L): DataFrame = {
    val toks = docs
      .select(col(idCol), col(langCol),
        split(TextAnalysis.normalize(col(textCol)), " ", -1).as("t"))
      .filter(size(col("t")) >= 2)
    val bi = toks.select(col(idCol), col(langCol),
      explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("bg"))
    // per-language MLE bigram model: P(w2|w1, lang) = c12 / c1
    val c12 = bi.groupBy(col(langCol), col("bg")).agg(count(lit(1)).as("c12"))
    val c1 = c12.groupBy(col(langCol),
        split(col("bg"), " ").getItem(0).as("w1"))
      .agg(sum(col("c12")).as("c1"))
    val doc = bi.join(c12, Seq(langCol, "bg"))
      .withColumn("w1", split(col("bg"), " ").getItem(0))
      .join(c1, Seq(langCol, "w1"))
      .select(col(idCol), col(langCol),
        floor(log(col("c12").cast("double") / col("c1")) * 1e6)
          .cast("long").as("lp_u"))
      .groupBy(col(idCol), col(langCol))
      .agg(count(lit(1)).cast("int").as("n_bigrams"), sum(col("lp_u")).as("ll_u"))
    // integer micro-nats per bigram; ll_u ≤ 0, so −ll_u ≥ 0 and integral
    // DIV == DuckDB's floor `//` on the non-negative operands
    val ppl = doc.select(col(idCol), col(langCol), col("n_bigrams"),
      expr("(-ll_u) DIV n_bigrams").as("ppl_u"))
    val binned = ppl.withColumn("bin", expr(s"ppl_u DIV ${binWidth}L"))
    // answer-sized histogram: one map-side-combined count per (lang, bin)
    val bins = binned.groupBy(col(langCol), col("bin"))
      .agg(count(lit(1)).as("c"))
    val byLang = Window.partitionBy(col(langCol))
    val cum = bins
      .withColumn("cum", sum(col("c")).over(byLang.orderBy(col("bin"))))
      .withColumn("tot", sum(col("c")).over(byLang))
    // first bin where the cumulative count reaches 1/3 (2/3) of the mass
    val cuts = cum.groupBy(col(langCol)).agg(
      min(when(col("cum") * 3 >= col("tot"), col("bin"))).as("cut1"),
      min(when(col("cum") * 3 >= col("tot") * 2, col("bin"))).as("cut2"))
    binned.join(broadcast(cuts), Seq(langCol))
      .select(col(idCol), col(langCol), col("n_bigrams"), col("ppl_u"),
        when(col("bin") <= col("cut1"), lit("head"))
          .when(col("bin") <= col("cut2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }
}
