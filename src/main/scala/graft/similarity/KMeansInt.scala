package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-exact distributed k-means (Lloyd's algorithm) — semantic
  * clustering over an embedding column: corpus topic maps, diversity-
  * aware sampling, cluster-balanced training mixes. The iterative
  * sibling of the one-shot partitioners already in the repo (Ivf trains
  * centroids by sampling; this refines them to a fixpoint over the FULL
  * corpus).
  *
  * Exactness is the design constraint (the q100 convention for
  * iterative fixpoints): components are quantized to integer units
  * (`round(x·scale)`, computed in double from the same float32 both
  * engines read), distances are integer sums of squares, and the
  * centroid update is integer mean `sum div count` — Spark `div`,
  * DuckDB `//`, and Java `/` all truncate toward zero (verified
  * including negatives), so every engine reproduces the same centroids
  * and the same assignments bit-for-bit, and ties (equal distance)
  * break to the smaller centroid index in both formulations.
  *
  * Scale shape per iteration: assignment is a pure projection —
  * centroids travel as ONE k×d ARRAY-OF-ARRAYS LITERAL inside the
  * expression (the broadcast of a k×d table, without even a broadcast
  * exchange), so no join and no shuffle touches the corpus; the update
  * is one posexplode → groupBy(cluster, pos) with map-side partial
  * sums, so the only thing that crosses the wire is k×d partial
  * aggregates per partition. The per-round driver collect is k×d rows
  * — bounded by construction, not by data. Empty clusters keep their
  * previous centroid (matched by the oracle's
  * COALESCE-from-previous-round).
  *
  * Parameter scale: the argmin is a fixed-shape expression — one
  * Literal holding the k×d table plus a constant number of
  * higher-order-function nodes — so plan/codegen size is O(1) in k
  * (the literal's DATA is k×d, but data is not expression tree). The
  * earlier formulation (a fold of per-centroid `when` chains, each
  * embedding its own d-element literal) grew the tree ~2^k with
  * per-row distance recomputation — fine at report-scale k, hostile to
  * Catalyst past k ≈ 15; this form takes k = 512+ without stressing
  * analysis or codegen (asserted in KMeansSpec).
  */
object KMeansInt {

  /** Quantize a float-array column to integer units. */
  def quantize(vec: Column, scale: Long): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Argmin cluster index over literal centroids; ties break to the
    * smaller index (`array_position` returns the FIRST occurrence of the
    * minimum). The k×d centroid table is ONE nested-array literal and the
    * distance array is built by a single `transform` — expression-tree
    * size is constant in k, with each distance computed exactly once. */
  def assignExpr(q: Column, centroids: Array[Array[Long]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val cents = typedlit(centroids.map(_.toSeq).toSeq)
    val dists = transform(sequence(lit(0), lit(centroids.length - 1)),
      j => aggregate(
        zip_with(q, element_at(cents, j + 1), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x))
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** `iters` rounds of (assign → update) from seeds = the quantized
    * vectors of the k smallest `idCol` values. Returns (rows of `vecs`
    * + `cluster` = the final round's assignment, final centroids). */
  def fit(vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Long = 1000L): (DataFrame, Array[Array[Long]]) = {
    require(k >= 1 && iters >= 1, "k and iters must be positive")
    // quantized corpus, materialized once — every round scans it twice
    // (assignment projection + update aggregate)
    val base = vecs.withColumn("__q", quantize(col(vecCol), scale))
      .localCheckpoint(true)
    var centroids: Array[Array[Long]] = base
      .orderBy(col(idCol)).limit(k)
      .select(col("__q")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(centroids.length == k, s"need >= $k rows to seed $k clusters")
    var assigned: DataFrame = null
    for (_ <- 1 to iters) {
      assigned = base.withColumn("cluster", assignExpr(col("__q"), centroids))
      // k×d partial-aggregated rows cross the wire; k×d rows reach the
      // driver — bounded by (k, d), not by the corpus
      val sums = assigned
        .select(col("cluster"), posexplode(col("__q")).as(Seq("pos", "q")))
        .groupBy("cluster", "pos")
        .agg(sum("q").as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2) / r.getLong(3)))
        .toMap
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        old.indices.map(p => sums.getOrElse((j, p), old(p))).toArray
      }
    }
    (assigned.drop("__q"), centroids)
  }
}
