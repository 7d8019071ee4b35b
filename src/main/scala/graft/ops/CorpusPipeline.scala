package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** The whole corpus-preparation pipeline as one composition — the "raw
  * crawl in, trainer shards out" chain every stage in this library exists
  * to serve:
  *
  *   exact dedup → quality filter → repetition filter → benchmark
  *   decontamination → near-dup removal (MinHash) → context-window packing
  *
  * Each stage is the already-tested operator; the value here is the
  * composition being ONE lazy DataFrame plan: Catalyst sees the whole
  * chain (filters merge, projections prune, nothing materializes between
  * stages unless a stage inherently shuffles), and the pipeline runs at
  * corpus scale exactly as its pieces do. Returns
  * (doc_id, shard, n_tok, seq_id) — the trainer-facing assignment.
  */
object CorpusPipeline {

  def prepare(docs: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      minChars: Int = 50, minAlpha: Double = 0.5,
      maxRepetition: Double = 0.5, jaccardThreshold: Double = 0.8,
      ctxTokens: Int = 512, shards: Int = 64): DataFrame = {
    // exact dedup: one representative (min id) per normalized fingerprint.
    // min_by, not first(): group members share normalized text but can
    // differ in raw whitespace, and the quality gates below measure RAW
    // text — the representative must be deterministic or a marginal doc
    // could flip across runs.
    val deduped = docs
      .groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as(idCol), min_by(col(textCol), col(idCol)).as(textCol))
      .drop("fp")
    // quality + repetition gates (pure codegen predicates)
    val quality = deduped.filter(
      TextAnalysis.nChars(col(textCol)) >= minChars &&
        TextAnalysis.alphaRatio(col(textCol)) >= minAlpha &&
        TrainingPrep.repetitionScore(col(textCol)) <= maxRepetition)
    // eval-leakage guard
    val clean = TrainingPrep.decontaminate(quality, textCol, idCol,
      benchmark, textCol)
    // near-dup removal: drop the higher id of every MinHash-verified pair
    // (greedy min-id keep — deterministic, answer-sized join)
    val dupIds = Dedup.minHashPairs(clean, textCol, idCol,
        threshold = jaccardThreshold)
      .select(col("id_b").as(idCol)).distinct()
    val unique = clean.join(dupIds, Seq(idCol), "left_anti")
    // trainer prep: deterministic shard + context-window assignment
    TrainingPrep.packSequences(unique, textCol, idCol, ctxTokens, shards)
  }
}
