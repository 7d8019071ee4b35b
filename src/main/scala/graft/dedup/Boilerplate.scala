package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sub-document boilerplate removal: drop the PASSAGES that repeat
  * across the corpus, keep the documents (CCNet's per-shard duplicated-
  * line removal, Wenzek et al. LREC'20, generalized to fixed-width
  * token windows so it applies to corpora without line structure).
  * Document-level dedup (Dedup.scala) can't catch this class: a page
  * whose body is unique but whose header/footer/nav text appears on a
  * million other pages survives every whole-document fingerprint, and
  * the shared passage ends up memorized by the model.
  *
  * CCNet discipline — normalize the KEYS, emit the TEXT: segmentation
  * is over WHITESPACE chunks of the raw text (whitespace collapsed,
  * punctuation and case intact), the duplicate-detection key is the
  * case-folded md5 of each window, and reassembly re-joins the RAW
  * chunks — so passage removal never strips punctuation from the
  * surviving text (downstream quality gates and packed shards see real
  * prose, not an alnum token stream), while case variants of the same
  * boilerplate still collapse to one key.
  *
  * Pipeline (all relational, no driver state):
  *   1. segment: consecutive non-overlapping k-chunk windows per doc —
  *      one codegen projection (chunks → transform over a sequence of
  *      window starts), then posexplode.
  *   2. df-count: passages travel as md5(lower(window)) keys — fixed
  *      32 bytes through the shuffle regardless of k, and portable (the
  *      oracle re-derives the same keys, unlike xxhash64).
  *      `countDistinct(doc)` per key is the standard two-phase distinct
  *      aggregate; the shuffle is linear in corpus tokens, the same
  *      class as the q79 inverted index.
  *   3. drop: passages with df ≥ minDocs form the hot set — answer-sized
  *      (bounded by corpus/minDocs, in practice the header/footer
  *      vocabulary), so it BROADCASTS back as a left-anti join; the
  *      corpus never shuffles for the filter.
  *   4. reassemble: surviving (position, raw passage) pairs group once
  *      on doc id — per-group state is bounded by one document — and
  *      re-join in position order; docs that lose every passage come
  *      back as empty text via the left join against the doc spine.
  *
  * Returns one row per input document:
  *   (idCol, n_seg, n_kept, clean_md5) — counts of total/surviving
  * passages and the md5 of the cleaned text (passages joined by a
  * single space; empty string when nothing survives), so the full
  * reconstruction is hash-audited without shipping corpus-sized text
  * to the caller.
  */
object Boilerplate {

  def dropDuplicatedPassages(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, minDocs: Int = 2): DataFrame = {
    val r = reassemble(docs, textCol, idCol, k, minDocs)
    r.select(col(idCol), col("n_seg"), col("n_kept"),
      md5(coalesce(col("__cleaned"), lit(""))).as("clean_md5"))
  }

  /** The cleaned TEXT itself — the pipeline-stage form of
    * [[dropDuplicatedPassages]] (which hash-audits the reconstruction
    * instead of shipping corpus-sized text back to a caller): one row
    * per input doc, `textCol` = surviving raw passages joined by a
    * single space (whitespace-normalized ONLY — punctuation and case
    * survive; dedup KEYS are case-folded, per the CCNet normalize-keys
    * / emit-text convention), empty when nothing survives.
    * `CorpusPipeline` inserts this between exact dedup and the quality
    * gates, where a doc reduced to boilerplate-only falls out via the
    * min-length gate. */
  def cleanDocs(docs: DataFrame, textCol: String, idCol: String,
      k: Int = 8, minDocs: Int = 2,
      materializeSegments: Boolean = false): DataFrame =
    reassemble(docs, textCol, idCol, k, minDocs, materializeSegments)
      .select(col(idCol), coalesce(col("__cleaned"), lit("")).as(textCol))

  /** Whitespace chunks of the raw text: collapse runs, trim, split on
    * the single space — punctuation and case intact, empty text → empty
    * array (split of "" would yield [""], a phantom chunk). */
  private def wsChunks(c: Column): Column = {
    val collapsed = trim(regexp_replace(c, "\\s+", " "))
    when(length(collapsed) > 0, split(collapsed, " ", -1))
      .otherwise(array().cast("array<string>"))
  }

  /** Shared segmentation → hot-set drop → position-order reassembly:
    * (idCol, n_seg, n_kept, __cleaned nullable).
    *
    * `materializeSegments` (r16): three branches consume the segmented
    * spine — the hot-set build, the anti-join probe, and the doc spine —
    * so a LAZY checkpoint makes the regexp collapse + window-slice
    * transform run once instead of per branch. MEASURED both ways at
    * sf0.1: a win only when the caller's input is itself a landed
    * intermediate consumed by an expensive composition (q125's pipeline:
    * cpu 32.0 → 25.7 s with it), a 3–7× REGRESSION on the standalone
    * operator over a raw scan (q101: 0.35 → 1.23 s — the fully-pipelined
    * codegen plan beats caching the segment arrays). So it is opt-in:
    * CorpusPipeline passes materializeClean (the pipeline lands
    * intermediates anyway); the standalone surface keeps the lazy form. */
  private def reassemble(docs: DataFrame, textCol: String, idCol: String,
      k: Int, minDocs: Int, materializeSegments: Boolean = false): DataFrame = {
    require(k >= 1, "passage width k must be >= 1")
    require(minDocs >= 2, "minDocs < 2 would drop every passage")
    val toks = wsChunks(col(textCol))
    // ceil(n/k) window starts; sequence() must be guarded — Spark's
    // sequence(0, -1) counts DOWN, it does not return empty
    val nSeg = ceil(size(toks) / lit(k.toDouble)).cast("int")
    val segs = when(size(toks) > lit(0),
      transform(sequence(lit(0), nSeg - 1),
        i => concat_ws(" ", slice(toks, i * k + 1, lit(k)))))
      .otherwise(array().cast("array<string>"))

    val spine0 = docs.select(col(idCol), nSeg.cast("long").as("n_seg"), segs.as("segs"))
    val spine =
      if (materializeSegments) spine0.localCheckpoint(false) else spine0
    val seg = spine.select(col(idCol), posexplode(col("segs")).as(Seq("seg_i", "seg")))

    val hot = seg.select(md5(lower(col("seg"))).as("h"), col(idCol))
      .groupBy("h").agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df") >= lit(minDocs))
      .select("h")

    val kept = seg.join(broadcast(hot), md5(lower(seg("seg"))) === hot("h"), "left_anti")
    val cleaned = kept
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_kept"),
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("seg_i"), col("seg")))),
          s => s.getField("seg"))).as("cleaned"))

    spine.select(col(idCol), col("n_seg"))
      .join(cleaned, Seq(idCol), "left")
      .select(col(idCol), col("n_seg"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        col("cleaned").as("__cleaned"))
  }
}
