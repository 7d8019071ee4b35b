package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** The dataset card (q188) as a MERGEABLE artifact — the 100 TB release
  * story. A whole-corpus card recompute per release is one full scan of
  * everything ever ingested; the shippable shape is per-shard PARTIAL
  * cards that an ingest batch lands next to its data, merged at release
  * time:
  *
  *  - docs/tokens/chars merge by SUM at (source, lang) cell granularity —
  *    the partial is answer-sized (cells × shards).
  *  - the exact-duplicate count CANNOT merge at cell granularity (dup
  *    detection is irreducibly global: the same fingerprint can land in
  *    different shards and different cells), so the partial carries the
  *    fp TALLY table — per (shard, fp, source, lang) counts, the one
  *    corpus-keyed partial. Merge = one fp-keyed shuffle to find the
  *    globally-repeated fingerprints, then an answer-per-cell rollup.
  *    This is the honest boundary: exact dup counts need the fp table; a
  *    deploy that can't afford it would swap in a sketch and STATE the
  *    estimate (the q128 HLL discipline) — not silently under-count.
  *
  * The merge identity — merged partials == the from-scratch card, at any
  * shard count — is driver-gated (q190's oracle is q188's verbatim, the
  * q178/q183 same-answer-independently-derived discipline) and
  * shard-count-invariance is unit-tested. Incremental releases re-merge
  * landed partials without touching old shards' documents.
  */
object DatasetCard {

  /** Per-document card facts — the single definition q188's from-scratch
    * card and the partials both measure: normalized-text fingerprint
    * (exact-dup key), whitespace-convention token count (empty-text
    * guard: split('') is a phantom token), chars. One projection. */
  def docFacts(docs: DataFrame): DataFrame = {
    val trimmed = trim(regexp_replace(col("text"), "\\s+", " "))
    docs.select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      when(length(trimmed) > 0, size(split(trimmed, " ", -1)))
        .otherwise(0).cast("long").as("n_tok"))
  }

  /** The from-scratch card (q188): per-(source, lang) + '__all' exact
    * integers — docs, globally-repeated-fingerprint docs, tokens, chars.
    * One fingerprint count shuffle + one dup-fp flag join + one rollup. */
  def card(docs: DataFrame): DataFrame = {
    val base = docFacts(docs)
    val dupFp = base.groupBy(col("fp")).agg(count(lit(1)).as("nf"))
      .filter(col("nf") >= 2).select(col("fp"), lit(1L).as("isdup"))
    val flagged = base.join(dupFp, Seq("fp"), "left")
      .select(col("source"), col("lang"),
        coalesce(col("isdup"), lit(0L)).as("isdup"), col("n_tok"), col("n_chars"))
    def roll(src: Column, lng: Column) =
      flagged.groupBy(src.as("source"), lng.as("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("isdup")).as("n_dup_docs"),
          sum(col("n_tok")).as("n_tokens"), sum(col("n_chars")).as("n_chars"))
    roll(col("source"), col("lang")).unionByName(roll(lit("__all"), lit("__all")))
  }

  /** Per-shard partial cards, MATERIALIZED (eager localCheckpoint — the
    * landed artifacts an ingest batch writes; in production these are two
    * small parquet tables per shard):
    *  - cells: (shard, source, lang, n_docs, n_tokens, n_chars)
    *  - fps:   (shard, fp, source, lang, nf) — the dup-detection boundary
    * Shard assignment is the house md5 draw over doc_id (engine-portable,
    * stable) — keyed by DOCUMENT, not content, so copies of the same text
    * land in different shards and the merge's cross-shard dup detection
    * is genuinely exercised (an ingest batch is a doc set, not an fp
    * set). */
  def partials(docs: DataFrame, nShards: Int,
      salt: String = "card"): (DataFrame, DataFrame) = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val facts = docFacts(docs)
      .withColumn("shard", Sampling.shard(col("doc_id"), nShards, salt))
    val (cells, fps) = partialTables(facts)
    (cells.localCheckpoint(true), fps.localCheckpoint(true))
  }

  /** The two partial-card aggregations over a facts table that already
    * carries its `shard` column — the single definition [[partials]]
    * (md5 shards) and the streaming ingest path (shard = micro-batch id)
    * both land. LAZY: the caller owns materialization (checkpoint or
    * parquet write — whatever artifact boundary it is landing). */
  def partialTables(facts: DataFrame): (DataFrame, DataFrame) = {
    val cells = facts.groupBy(col("shard"), col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
    val fps = facts.groupBy(col("shard"), col("fp"), col("source"), col("lang"))
      .agg(count(lit(1)).as("nf"))
    (cells, fps)
  }

  /** Merge landed partials into the release card — identical to
    * [[card]] of the union of the shards' documents. Cell sums merge by
    * SUM (answer-sized); dup counts come from ONE fp-keyed shuffle over
    * the fp tallies (global nf ≥ 2 → every tallied doc of that fp is a
    * dup) rolled up per cell, plus the '__all' rollup. */
  def merge(cells: DataFrame, fps: DataFrame): DataFrame = {
    val cellTot = cells.groupBy(col("source"), col("lang"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
    val fpTot = fps.groupBy(col("fp")).agg(sum(col("nf")).as("nfg"))
      .filter(col("nfg") >= 2)
    val dupCells = fps.join(fpTot.select(col("fp")), Seq("fp"))
      .groupBy(col("source"), col("lang")).agg(sum(col("nf")).as("n_dup_docs"))
    val perCell = cellTot.join(dupCells, Seq("source", "lang"), "left")
      .select(col("source"), col("lang"), col("n_docs"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"),
        col("n_tokens"), col("n_chars"))
    val allRow = cellTot
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .crossJoin(fpTot.agg(coalesce(sum(col("nfg")), lit(0L)).as("n_dup_docs")))
      .select(lit("__all").as("source"), lit("__all").as("lang"),
        col("n_docs"), col("n_dup_docs"), col("n_tokens"), col("n_chars"))
      // empty-partials consistency: card() of zero documents is ZERO rows
      // (the groupBy has nothing to group); without this filter the merge
      // path would emit one null-sum '__all' row and the identity breaks
      // at the degenerate boundary
      .filter(col("n_docs").isNotNull)
    perCell.unionByName(allRow)
  }
}
