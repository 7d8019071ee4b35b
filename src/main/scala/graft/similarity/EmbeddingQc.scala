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

  /** True iff the vector is malformed: NULL vector, NULL component, or a
    * non-finite component. NULLs need the explicit check — under
    * three-valued logic a NULL component makes [[hasNonFinite]] and
    * [[norm2MicroUnits]] evaluate to NULL, so the truncated-write vector
    * this operator exists to catch would otherwise pass QC uncounted.
    * The inner predicate tests IS NULL first and is therefore never NULL
    * itself, so `exists` returns a real boolean; a NULL vector
    * short-circuits through the OR. */
  def malformed(vec: Column): Column =
    vec.isNull || exists(vec, x => {
      val xd = x.cast("double")
      x.isNull || isnan(xd) || abs(xd) === lit(Double.PositiveInfinity)
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
    * min_n2_u, max_n2_u) — norm stats over clean vectors only. "Bad" is
    * [[malformed]]: non-finite OR NULL (vector or component). */
  def qcReport(embs: DataFrame, vecCol: String, groupCol: String): DataFrame = {
    val bad = malformed(col(vecCol))
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
