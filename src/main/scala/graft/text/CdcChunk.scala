package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (the LBFS / rsync / dedup-storage family,
  * Muthitacharoen SOSP'01): split text at positions where a hash of the
  * trailing `w`-character window hits 0 mod `m`, so boundaries depend
  * only on LOCAL content — insert one word at the front of a document
  * and every fixed-size chunk shifts, but CDC boundaries downstream of
  * the edit stay EXACTLY where they were. That stability is the whole
  * point: chunk-level hashes become a storage/transfer dedup key that
  * survives edits, prepended boilerplate, and shard re-concatenation —
  * the sub-document complement of q27 (whole-doc keys) and q101
  * (passage keys at fixed token windows).
  *
  * The classic implementation slides a ROLLING polynomial hash; this
  * operator hashes each window with md5 instead — same boundary
  * semantics (a pure function of the window's bytes), chosen because
  * md5 is the repo's engine-portable hash convention (q29/q129/q138):
  * the DuckDB oracle replays every boundary bit-for-bit, which no
  * engine-specific rolling-hash builtin allows. Cost is O(len · w)
  * hashing per document instead of O(len) — stated, not hidden; w is
  * small and the pass is embarrassingly per-row.
  *
  * Scale shape: one projection computes the boundary array AND the
  * chunk structs array-side (transform over the boundary list — the
  * document text is never duplicated per chunk through a shuffle), then
  * one generator explodes answer-sized chunk rows. No window, no join,
  * no state.
  */
object CdcChunk {

  /** Chunk rows (id, idx, start, len, h) for every doc: 1-based chunk
    * index, 1-based char start, char length, md5 of the chunk text.
    * Boundaries: position i (w ≤ i ≤ len) ends a chunk iff
    * md5_60(window ending at i) ≡ 0 (mod m); the document end always
    * ends the last chunk. Text is normalized to [a-z0-9 ] first (the
    * q127 portability discipline — char positions == byte positions in
    * both engines). */
  def chunks(docs: DataFrame, textCol: String, idCol: String,
      w: Int = 16, m: Int = 64): DataFrame = {
    require(w >= 2, s"w must be >= 2, got $w")
    require(m >= 2, s"m must be >= 2, got $m")
    val t = regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " ")
    def md5_60(c: Column) = conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    // candidate end positions w..len (sequence counts DOWN on an empty
    // range — the q101 guard)
    val pos = when(length(t) >= w, sequence(lit(w), length(t)))
      .otherwise(array().cast("array<int>"))
    val bnds = filter(pos, i =>
      pmod(md5_60(t.substr(i - w + 1, lit(w))), lit(m)) === 0)
    // the document end always closes the last chunk (dedup'd if it is
    // already a content boundary)
    val allB = when(size(bnds) > 0 && element_at(bnds, size(bnds)) === length(t),
      bnds).otherwise(concat(bnds, array(length(t).cast("int"))))
    val chunkStructs = transform(col("__b"), (e, j) => {
      // previous boundary: 0-based extract at j-1 (j is the 0-based
      // index of the CURRENT boundary)
      val prev = when(j === 0, lit(0)).otherwise(col("__b")(j - 1))
      struct((j + 1).cast("long").as("idx"),
        (prev + 1).cast("long").as("start"),
        (e - prev).cast("long").as("len"),
        md5(col("__t").substr(prev + 1, e - prev)).as("h"))
    })
    docs.filter(length(t) >= 1)
      .select(col(idCol).as("id"), t.as("__t"), allB.as("__b"))
      .select(col("id"), explode(chunkStructs).as("c"))
      .select(col("id"), col("c.idx"), col("c.start"), col("c.len"), col("c.h"))
  }
}
