package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** The whole corpus-preparation pipeline as one composition — the "raw
  * crawl in, trainer shards out" chain every stage in this library exists
  * to serve:
  *
  *   exact dedup → shared-passage (boilerplate) removal → quality
  *   filter → repetition filter → benchmark decontamination → near-dup
  *   cluster removal (MinHash + connected components) → context-window
  *   packing
  *
  * Each stage is the already-tested operator; stages compose as ONE lazy
  * DataFrame plan (filters merge, projections prune) up to the cleaned
  * corpus, which MATERIALIZES once (eager localCheckpoint): it is
  * consumed by three separate actions — the near-dup pair generation
  * (itself two passes: representatives + exact groups), the component
  * closure's eager iteration, and the final anti-join + packing — and
  * without the checkpoint Spark re-executes the whole exact-dedup →
  * passage-removal → gates → decontaminate chain (five corpus shuffles)
  * once per consumer (measured 63 → 23 cpu-s at sf0.1). At 100 TB this
  * materialization IS the durable intermediate an orchestrated pipeline
  * writes anyway — the cleaned-corpus snapshot; pass
  * `materializeClean = false` to keep the fully-lazy form for
  * single-action callers. Returns (doc_id, shard, n_tok, seq_id) — the
  * trainer-facing assignment.
  */
object CorpusPipeline {

  def prepare(docs: DataFrame, benchmark: DataFrame,
      textCol: String = "text", idCol: String = "doc_id",
      minChars: Int = 50, minAlpha: Double = 0.5,
      maxRepetition: Double = 0.5, jaccardThreshold: Double = 0.8,
      ctxTokens: Int = 512, shards: Int = 64,
      passageMinDocs: Int = 4, materializeClean: Boolean = true): DataFrame = {
    // exact dedup: one representative (min id) per normalized fingerprint,
    // in the collapseExact shape (the q28 rework, applied here in r15):
    // fingerprints land as a slim (id, 32-byte hash) checkpoint, the
    // per-fingerprint min(id) is a map-side-combinable aggregate over
    // that slim table, and the representative's RAW text (deterministic:
    // the min id's casing/spacing — group members share only NORMALIZED
    // text) is fetched back by an id equi-join. The previous
    // `min_by(text, id)` aggregate dragged the corpus text through the
    // fingerprint exchange AND re-ran that reduce-side aggregate once
    // per cleanDocs consumer (doc spine + two segmentation branches —
    // measured 11.7 → 7.5 s for the dedup+passage stage at sf0.1).
    // The rep snapshot materializes when materializeClean (the same
    // durable-intermediate argument as the cleaned-corpus checkpoint
    // below: a production pipeline lands the deduplicated crawl).
    // PRECONDITION: idCol is unique across docs (every corpus source in
    // this library is id-keyed) — the rep-text fetch below is an id
    // equi-join, and a duplicated id would fan out where the pre-r15
    // min_by aggregate collapsed. The fingerprint snapshot is gated on
    // materializeClean like every other landed intermediate here, so the
    // documented fully-lazy form stays job-free at construction.
    val withFp0 = docs.select(col(idCol),
      TextAnalysis.fingerprint(col(textCol)).as("fp"))
    val withFp =
      if (materializeClean) withFp0.localCheckpoint(true) else withFp0
    val repIds = withFp.groupBy("fp").agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val deduped0 = docs.join(repIds, Seq(idCol))
      .select(col(idCol), col(textCol))
    val deduped =
      if (materializeClean) deduped0.localCheckpoint(true) else deduped0
    // shared-passage (boilerplate) removal BEFORE the gates: the
    // million-page header vanishes while each unique body survives, and
    // a doc reduced to boilerplate-only falls out at the min-length
    // gate. passageMinDocs defaults ABOVE pair-level (4): a passage
    // repeated across a mere pair of docs is document duplication — the
    // near-dup cluster stage's job, which keys on exactly that shared
    // surface — while true template boilerplate repeats across many
    // docs. (Reassembly is from RAW whitespace chunks — punctuation and
    // case survive; only the dedup KEYS are case-folded, the CCNet
    // normalize-keys/emit-text convention — so the quality gates below
    // and the packed shards measure real prose, not an alnum token
    // stream.)
    val depassaged0 = graft.dedup.Boilerplate.cleanDocs(
      deduped, textCol, idCol, k = 8, minDocs = passageMinDocs,
      materializeSegments = materializeClean)
    // first truncation point: decontaminate consumes its input TWICE
    // (the gram explode and the keep-side of the anti-join), and
    // cleanDocs itself double-references the exact-dedup aggregate
    // (segment side + doc spine) — without truncation here the
    // dedup+passage subchain executes up to 4x inside the single
    // downstream action (measured: the chain materialization drops
    // 12.7 -> 3.4 s at sf0.1)
    val depassaged =
      if (materializeClean) depassaged0.localCheckpoint(true) else depassaged0
    // quality + repetition gates (pure codegen predicates)
    val quality = depassaged.filter(
      TextAnalysis.nChars(col(textCol)) >= minChars &&
        TextAnalysis.alphaRatio(col(textCol)) >= minAlpha &&
        TrainingPrep.repetitionScore(col(textCol)) <= maxRepetition)
    // eval-leakage guard; then the cleaned corpus materializes ONCE —
    // three downstream actions consume it (pair generation, the eager
    // component closure, the final anti-join + packing), and lineage
    // truncation here is what keeps the five-shuffle upstream chain from
    // re-executing per consumer (see the object scaladoc)
    val clean0 = TrainingPrep.decontaminate(quality, textCol, idCol,
      benchmark, textCol)
    val clean = if (materializeClean) clean0.localCheckpoint(true) else clean0
    // near-dup removal with CLUSTER semantics: MinHash pairs close into
    // connected components (transitive closure) and every non-minimum
    // member drops — one survivor per duplicate cluster. Greedy drop-the-
    // larger-of-each-pair keeps every local minimum instead: a chain
    // 2–9–4 would survive as {2, 4}. The component iteration runs on the
    // ANSWER-SIZED pair graph (the one eager sub-step in an otherwise
    // lazy plan — bounded actions over a tiny edge list).
    val clusters = Dedup.connectedComponents(
      Dedup.minHashPairs(clean, textCol, idCol, threshold = jaccardThreshold)
        .select("id_a", "id_b"), "id_a", "id_b")
    val dupIds = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    val unique = clean.join(dupIds, Seq(idCol), "left_anti")
    // trainer prep: deterministic shard + context-window assignment
    TrainingPrep.packSequences(unique, textCol, idCol, ctxTokens, shards)
  }

  /** [[prepare]] landed as a trainer-ready dataset: the packed assignment
    * written range-clustered on (shard, seq_id) via
    * [[graft.sources.Layout.writeClustered]], so each output file holds a
    * contiguous run of shards and a trainer pulling one shard reads a file
    * subset (row-group min/max skip the rest) instead of the whole corpus.
    * nFiles sizes the layout: one file per few shards is right when shards
    * ≫ executors. */
  def prepareAndWrite(docs: DataFrame, benchmark: DataFrame, outDir: String,
      nFiles: Int = 16, textCol: String = "text", idCol: String = "doc_id",
      ctxTokens: Int = 512, shards: Int = 64): Unit =
    graft.sources.Layout.writeClustered(
      prepare(docs, benchmark, textCol, idCol, ctxTokens = ctxTokens,
        shards = shards),
      outDir, nFiles, col("shard"), col("seq_id"))
}
