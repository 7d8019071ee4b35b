package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column quality control — the hygiene pass every vector
  * pipeline runs BEFORE index builds and similarity math: zero vectors
  * make cosine undefined (0/0), a single NaN/Inf component poisons every
  * dot product it touches (IVF training means, ADC lookup tables, heap
  * scores all go NaN), and both arrive in real corpora from upstream
  * encoder crashes and truncated writes. One linear scan, one
  * answer-sized (groups) shuffle; flags are per-row codegen.
  *
  * Determinism (the q89/q90 micro-unit rule): the squared norm
  * integerizes PER COMPONENT — floor(x²·10⁶), non-finite components
  * contribute 0 and are reported by their own flag — so the per-vector
  * sum is exact integer addition in array order on any engine, and
  * group min/max over it are order-free.
  */
object EmbeddingQc {

  /** True iff any component is NaN or ±Inf. */
  def hasNonFinite(vec: Column): Column =
    exists(vec, x => {
      val xd = x.cast("double")
      isnan(xd) || abs(xd) === lit(Double.PositiveInfinity)
    })

  /** Exact micro-unit squared norm: Σ floor(x²·10⁶) over finite
    * components (non-finite contribute 0 — flagged separately). */
  def norm2MicroUnits(vec: Column): Column =
    aggregate(vec, lit(0L), (acc, x) => {
      val xd = x.cast("double")
      acc + when(isnan(xd) || abs(xd) === lit(Double.PositiveInfinity), lit(0L))
        .otherwise(floor(xd * xd * lit(1e6)).cast("long"))
    })

  /** Per-group QC report: (group, n_vecs, n_zero, n_nonfinite,
    * min_n2_u, max_n2_u) — norm stats over clean vectors only. */
  def qcReport(embs: DataFrame, vecCol: String, groupCol: String): DataFrame = {
    val bad = hasNonFinite(col(vecCol))
    val n2u = norm2MicroUnits(col(vecCol))
    embs
      .select(col(groupCol), bad.as("bad"), n2u.as("n2_u"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("int").as("n_vecs"),
        sum(when(!col("bad") && col("n2_u") === 0L, 1).otherwise(0))
          .cast("int").as("n_zero"),
        sum(when(col("bad"), 1).otherwise(0)).cast("int").as("n_nonfinite"),
        min(when(!col("bad"), col("n2_u"))).as("min_n2_u"),
        max(when(!col("bad"), col("n2_u"))).as("max_n2_u"))
  }
}
