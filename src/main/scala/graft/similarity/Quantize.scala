package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar int8 embedding quantization — the storage-prep stage of an
  * embedding pipeline: float32 vectors compress 4× into (scale, int8
  * codes) with bounded reconstruction error (≤ scale/254 per element),
  * which is what large embedding stores actually persist; full-precision
  * rerank happens only on candidate sets.
  *
  * Symmetric per-vector scaling: scale = max|x_i|, code_i =
  * floor(x_i/scale·127 + 0.5). Everything is computed in DOUBLE with an
  * explicit rounding rule (floor(x+0.5), not a locale/mode-dependent
  * round()), so any engine reproduces the codes bit-for-bit — same
  * portability contract as [[graft.ops.Sampling]]. Pure projections:
  * zero shuffle at any corpus size.
  */
object Quantize {

  /** Per-vector symmetric scale: max absolute component, as double. */
  def scaleOf(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  /** int8-range codes (as int array) for a float-array column given its
    * [[scaleOf]] scale. All-zero vectors (scale 0) code to zeros. */
  def codes(vec: Column, scale: Column): Column =
    when(scale === 0d, transform(vec, _ => lit(0)))
      .otherwise(transform(vec,
        x => floor(x.cast("double") / scale * 127d + 0.5d).cast("int")))

  /** Reconstructed double vector from (scale, codes). */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => c.cast("double") * scale / 127d)
}
