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
  * Parameter scale: the argmin is ONE codegen expression
  * (`NearestCentroidL`) whose k×d table travels as a reference object —
  * plan/codegen size O(1) in k, and the per-row cost is a tight
  * generated long loop. The history matters at scale: the original fold
  * of per-centroid `when` chains grew the expression tree ~2^k (hostile
  * to Catalyst past k ≈ 15), and the intermediate higher-order-function
  * rewrite was tree-flat but interpreted (HOFs never whole-stage-
  * codegen), which dominated wall time once SemDeDup-style callers grew
  * k with the corpus — assignment is O(n·k·d). KMeansSpec asserts the
  * tree-size flatness at k = 512 plus a real k = 512 fit.
  */
object KMeansInt {

  /** Quantize a float-array column to integer units. */
  def quantize(vec: Column, scale: Long): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Argmin cluster index over the centroid table; ties break to the
    * smaller index (strict `<` keeps the earlier winner). Backed by the
    * codegen `NearestCentroidL` kernel: the k×d table ships once per
    * task as a reference object (expression-tree size O(1) in k), the
    * argmin is a tight generated long loop — ~100× the throughput of
    * the interpreted higher-order-function formulation, which matters
    * because assignment is O(n·k·d) and SemDeDup-style callers grow k
    * with the corpus. */
  def assignExpr(q: Column, centroids: Array[Array[Long]]): Column = {
    require(centroids.nonEmpty, "need at least one centroid")
    val dim = centroids(0).length
    graft.functions.VectorFunctions.nearestCentroidL(
      q, centroids.flatten, dim)
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
