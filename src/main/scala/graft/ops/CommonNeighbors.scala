package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Common-neighbor node similarity — the link-prediction / entity-
  * similarity primitive over a bipartite relation (suppliers sharing
  * customers, domains sharing outlinks, docs sharing entities): for node
  * pairs on the LEFT side of an edge list, the number of shared right-
  * side neighbors and the neighborhood Jaccard |N(a)∩N(b)| /
  * |N(a)∪N(b)|. Completes the graph family's pairwise view (CC groups,
  * PageRank ranks, BFS reaches, triangles close, LPA partitions — this
  * SCORES pairs).
  *
  * Shape: one distinct pass over the edges, then the wedge equi-join on
  * the shared-neighbor key with a map-side-combined (a, b) count — the
  * q107 wedge discipline, cost Σ_c d_c² over right-side degrees. That
  * sum is the honest price of EXACT pairwise counting (it is the number
  * of wedges that exist); `maxDeg` optionally drops right-side hubs
  * above a degree bound first — the standard approximation for
  * power-law neighborhoods, OFF by default because it changes the
  * answer (dropped hubs contribute no wedges). Top-k lands via a global
  * TakeOrdered under the (common DESC, a, b) total order — no full
  * sort materializes.
  */
object CommonNeighbors {

  /** Top-k left-node pairs by shared-neighbor count over `edges`
    * (src = left node, dst = shared-neighbor key). Returns
    * (n_a, n_b, common, deg_a, deg_b, jaccard), n_a < n_b, ordered by
    * (common DESC, n_a, n_b); jaccard is one IEEE division of exact
    * integer operands. */
  def topK(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxDeg: Option[Int] = None): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e0 = edges.select(col(srcCol).as("s"), col(dstCol).as("c")).distinct()
    val e = maxDeg match {
      case None => e0
      case Some(cap) =>
        require(cap >= 1, s"maxDeg must be >= 1, got $cap")
        val hubs = e0.groupBy(col("c")).agg(count(lit(1)).as("dc"))
          .filter(col("dc") > cap).select(col("c"))
        e0.join(hubs, Seq("c"), "left_anti")
    }
    val deg = e.groupBy(col("s")).agg(count(lit(1)).as("d"))
    val pairs = e.select(col("s").as("n_a"), col("c"))
      .join(e.select(col("s").as("n_b"), col("c")), "c")
      .filter(col("n_a") < col("n_b"))
      .groupBy(col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(deg.select(col("s").as("n_a"), col("d").as("deg_a")), "n_a")
      .join(deg.select(col("s").as("n_b"), col("d").as("deg_b")), "n_b")
      .select(col("n_a"), col("n_b"), col("common"), col("deg_a"), col("deg_b"),
        (col("common").cast("double") /
          (col("deg_a") + col("deg_b") - col("common"))).as("jaccard"))
      .orderBy(col("common").desc, col("n_a"), col("n_b"))
      .limit(k)
  }
}
