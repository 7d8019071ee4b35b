package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition (Seidman 1983; Batagelj–Zaveršnik's peel as a
  * distributed fixpoint): the maximal subgraph where EVERY node keeps
  * degree ≥ k — the crawl/link-graph curation filter that a one-shot
  * degree threshold cannot compute, because removals CASCADE: dropping
  * a degree-1 page lowers its neighbor's degree, which may now fall
  * below k and drop too (a pendant chain peels one node per round from
  * each end; a naive filter would keep all its interior nodes).
  *
  * Scale shape per round (the PageRank/q69 discipline): one map-side-
  * combined degree aggregate over the current edge set + two semi-joins
  * restricting edges to surviving endpoints, lineage truncated each
  * round; convergence is an exact edge-count equality (peeling only
  * removes, and every peeled node owned ≥ 1 edge, so equal counts ⟺
  * fixpoint) — a bounded driver action per round, never a collect of
  * data. Rounds are data-dependent (≤ the longest cascade); maxRounds
  * bounds the loop and non-convergence raises loudly rather than
  * returning a half-peeled graph.
  *
  * Input is a DIRECTED edge list that must already carry both
  * directions of each undirected edge (the q100/q130 graph
  * convention); degree = out-degree in that representation.
  */
object KCore {

  /** Nodes of the k-core with their within-core degree: (node, deg),
    * deg ≥ k. Empty result = the graph has no k-core. */
  def kcore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().localCheckpoint()
    PageRank.requireSameKeyType(e)
    var nEdges = e.count()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds && nEdges > 0) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select(col("src").as("node"))
      val e2 = e
        .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
      val n2 = e2.count()
      converged = n2 == nEdges
      e = e2
      nEdges = n2
      rounds += 1
    }
    require(converged || nEdges == 0,
      s"kcore: no fixpoint within $maxRounds rounds — the longest peel " +
        "cascade exceeds the bound; raise maxRounds")
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("node"), col("deg"))
  }
}
