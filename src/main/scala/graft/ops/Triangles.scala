package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting — the local-clustering primitive of
  * graph analytics (community density in a link graph, co-occurrence
  * cliques in a co-purchase graph), completing the repo's graph family:
  * connected components (grouping), PageRank (ranking), BFS
  * (reachability), triangles (cohesion).
  *
  * Algorithm: degree-ordered orientation (the compact-forward scheme of
  * Latapy, TCS 2008 / Suri-Vassilvitskii WWW'11 "MR-friendly" form).
  * Every undirected edge is oriented from its (degree, id)-smaller
  * endpoint to its larger one — a total order, so the oriented graph is
  * a DAG and every triangle {u,v,w} with u < v < w (in that order)
  * appears EXACTLY once as the path pair u→v, v→w closed by u→w. Two
  * shuffled equi-joins find them:
  *
  *   wedges   = oriented ⋈ oriented  on the middle vertex v
  *   closed   = wedges   ⋈ oriented  on (u, w)
  *
  * Why the orientation matters at 100 TB: out-degree in the oriented
  * graph is bounded by O(√m) (a node keeps only neighbors of larger
  * degree), so the wedge count — the intermediate that dominates — is
  * Σ outdeg² ≤ O(m^1.5) instead of Σ deg² which a hub node makes
  * quadratic. A star of a million spokes generates ZERO wedges at the
  * hub under orientation; unoriented it would generate 10¹².
  *
  * Exactness: counts are integers over equi-joins — engine-portable
  * with no numeric protocol (the q100/q104 convention).
  */
object Triangles {

  /** Per-node triangle participation over an UNDIRECTED graph given as
    * (a, b) pairs — duplicates, self-loops, and either orientation
    * tolerated (canonicalized away). Returns (node, n_tri) for nodes in
    * ≥ 1 triangle. */
  def countPerNode(edges: DataFrame): DataFrame = {
    val oriented = orient(edges)
    triangleTriples(oriented)
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
  }

  /** Global triangle count (one row). */
  def countTotal(edges: DataFrame): DataFrame =
    triangleTriples(orient(edges)).agg(count(lit(1)).as("n_triangles"))

  /** The canonical degree-ordered DAG: one row per undirected edge,
    * src strictly before dst under the (degree, id) total order.
    * Both intermediates are materialized once (localCheckpoint — the
    * PageRank/Bfs convention): `canon` feeds the degree count AND the
    * orientation join, `oriented` is referenced three times by the
    * triangle join — without truncation the caller's edge derivation
    * (often itself a join+distinct) would re-plan up to nine times. */
  private[graft] def orient(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(col("a"), col("b"))
      .filter(col("a") =!= col("b")) // self-loops close no triangle
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = canon.select(col("a").as("n")).unionByName(canon.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    // annotate both endpoints with their degree, then point the edge at
    // the (degree, id)-larger one; broadcast-sized only when the graph
    // is — deg is node-sized, so these are plain shuffled equi-joins
    canon
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(true)
  }

  /** All triangles as (u, v, w) rows, each exactly once: u→v, v→w edges
    * joined on the middle vertex, closed by the u→w edge. */
  private[graft] def triangleTriples(oriented: DataFrame): DataFrame = {
    val e1 = oriented.select(col("src").as("u"), col("dst").as("v"))
    val e2 = oriented.select(col("src").as("v"), col("dst").as("w"))
    val e3 = oriented.select(col("src").as("u"), col("dst").as("w"))
    e1.join(e2, "v").join(e3, Seq("u", "w")).select("u", "v", "w")
  }

  /** INCREMENTAL triangle counting — the delta-dedup discipline (q147/
    * q192/q197) applied to the graph family: a NEW edge batch is
    * adjudicated against a standing edge set by enumerating ONLY the
    * triangles containing at least one delta edge, never re-running the
    * standing graph's wedge join — the Σ outdeg² ≈ O(m^1.5) term that
    * dominates a full recount and the whole reason an incremental path
    * exists at 100 TB.
    *
    * Every new triangle has ≥1 delta edge, and under the degree-ordered
    * orientation of the UNION graph it appears exactly once as
    * (e1: u→v, e2: v→w, e3: u→w). Splitting by the POSITION of the
    * FIRST delta edge in that triple makes the cases disjoint and
    * exhaustive:
    *   case 1: e1 ∈ D                 (e2, e3 anything)
    *   case 2: e1 ∈ E, e2 ∈ D         (e3 anything)
    *   case 3: e1 ∈ E, e2 ∈ E, e3 ∈ D (anchored on the closing edge:
    *           middle v with (u,v) ∈ E and (v,w) ∈ E)
    * so every wedge-GENERATING join is delta-anchored (the delta side
    * broadcasts) and the standing table is only SCANNED — once for
    * degrees, once per closing equi-join. What the probe saves is the
    * recount's SUPERLINEAR wedge term; the linear standing terms (the
    * degree pass, the orientation joins, the closing scans) remain, so
    * probe cost grows with the corpus but the saving factor WIDENS
    * (measured, §6 two-axis probe at a fixed 18k-edge delta: 2.0×
    * cheaper than the recount at 180k standing edges, 2.9× at 5.4M).
    * A production deployment holds the degree table and oriented edge
    * layout as maintained artifacts (degrees merge by addition), which
    * removes the orientation term too; recomputing them here keeps the
    * operator self-contained, stated.
    *
    * Degrees — and with them the orientation — are those of the UNION
    * graph, recomputed in one linear pass; a production index would keep
    * the degree table incrementally (counts merge by addition), stated.
    * The triangle SET is orientation-independent, so the result equals
    * countPerNode(union) − countPerNode(standing) exactly — the identity
    * the oracle checks.
    *
    * Returns (node, n_new) for nodes in ≥1 new triangle — the increment
    * to ADD to a standing per-node count table (q107's output is such a
    * table; counts merge by addition). Delta edges already standing are
    * dropped (they close nothing new); duplicates, self-loops, and
    * either orientation tolerated on both inputs. */
  def deltaPerNode(standing: DataFrame, delta: DataFrame): DataFrame = {
    def canon(df: DataFrame) = df
      .select(col("a"), col("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val cs = canon(standing).localCheckpoint(true)
    val cd = canon(delta).join(cs, Seq("a", "b"), "left_anti")
      .localCheckpoint(true)
    val all = cs.withColumn("is_d", lit(false))
      .unionByName(cd.withColumn("is_d", lit(true)))
    val deg = all.select(col("a").as("n"))
      .unionByName(all.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val oriented = all
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("a")).otherwise(col("b")).as("src"),
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          col("b")).otherwise(col("a")).as("dst"),
        col("is_d"))
      .localCheckpoint(true)
    val dOr = broadcast(oriented.filter(col("is_d")))
    val eOr = oriented.filter(!col("is_d"))
    // cases 1+2 share the (u,w) closure — union the delta-anchored
    // wedges first so the closing join scans the edge table ONCE
    val w1 = dOr.select(col("src").as("u"), col("dst").as("v"))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), "v")
      .select("u", "v", "w")
    val w2 = dOr.select(col("src").as("v"), col("dst").as("w"))
      .join(eOr.select(col("src").as("u"), col("dst").as("v")), "v")
      .select("u", "v", "w")
    val t12 = w1.unionByName(w2)
      .join(oriented.select(col("src").as("u"), col("dst").as("w")), Seq("u", "w"))
    // case 3: only the closing edge is delta — anchor on it
    val t3 = dOr.select(col("src").as("u"), col("dst").as("w"))
      .join(eOr.select(col("src").as("u"), col("dst").as("v")), "u")
      .join(eOr.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    t12.select("u", "v", "w").unionByName(t3.select("u", "v", "w"))
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_new"))
  }
}
