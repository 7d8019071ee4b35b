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
  * centroids travel as ARRAY LITERALS inside the expression (the
  * broadcast of a k×d table, without even a broadcast exchange), so no
  * join and no shuffle touches the corpus; the update is one
  * posexplode → groupBy(cluster, pos) with map-side partial sums, so
  * the only thing that crosses the wire is k×d partial aggregates per
  * partition. The per-round driver collect is k×d rows — bounded by
  * construction, not by data. Empty clusters keep their previous
  * centroid (matched by the oracle's COALESCE-from-previous-round).
  */
object KMeansInt {

  /** Quantize a float-array column to integer units. */
  def quantize(vec: Column, scale: Long): Column =
    transform(vec, x => round(x.cast("double") * scale).cast("long"))

  /** Squared integer distance from quantized vector `q` to literal centroid. */
  private def dist2(q: Column, centroid: Array[Long]): Column =
    aggregate(
      zip_with(q, typedlit(centroid.toSeq), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** Argmin cluster index over literal centroids; ties break to the
    * smaller index (strict < keeps the earlier winner). */
  def assignExpr(q: Column, centroids: Array[Array[Long]]): Column = {
    val dists = centroids.map(c => dist2(q, c))
    dists.zipWithIndex.tail
      .foldLeft((lit(0), dists(0))) { case ((cl, best), (d, j)) =>
        (when(d < best, lit(j)).otherwise(cl), when(d < best, d).otherwise(best))
      }._1
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
