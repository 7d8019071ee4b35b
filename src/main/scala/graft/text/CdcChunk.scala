package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{bridge, RollingChunkBounds}

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
  * The window hash is the classic Karp–Rabin ROLLING polynomial
  * ([[RollingChunkBounds]]: B=131 mod 2^31−1, one O(len) codegen loop
  * per document) — r10 shipped per-window md5 here for oracle
  * portability and paid O(len·w) hashing (51 s at sf0.1, ~⅓ of the
  * whole suite); the polynomial keeps the portability (every
  * intermediate < 2^39 fits 64-bit integers, so DuckDB replays each
  * window as an explicit Σ code·B^j with the coefficients inlined) at
  * the O(len) cost the operator is supposed to have.
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
    * Boundaries: position i (w ≤ i ≤ len) ends a chunk iff the rolling
    * polynomial hash of the window ending at i ≡ 0 (mod m); the
    * document end always ends the last chunk. Text is normalized to
    * [a-z0-9 ] first (the q127 portability discipline — char positions
    * == byte positions in both engines, which the ASCII contract of
    * [[RollingChunkBounds]] requires). */
  def chunks(docs: DataFrame, textCol: String, idCol: String,
      w: Int = 16, m: Int = 64): DataFrame = {
    require(w >= 2, s"w must be >= 2, got $w")
    require(m >= 2, s"m must be >= 2, got $m")
    val t = regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " ")
    val bnds = bridge.column(RollingChunkBounds(bridge.expression(t), w, m))
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
