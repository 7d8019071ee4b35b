package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank as join-based message passing — the iterative
  * graph-analytics capability class beyond the repo's connected
  * components (dedup/Dedup.scala): importance ranking over an edge
  * list, the shape behind domain authority for crawl prioritization
  * and link-graph quality signals in web-corpus curation.
  *
  * Exactness across engines is the design constraint (every `queries`
  * entry must hash-match a DuckDB oracle): floating-point PageRank sums
  * are order-sensitive, so ranks here live in integer MICRO-UNITS and
  * the recurrence is all-integer —
  *
  *   r₀(v)   = 1_000_000
  *   rₜ₊₁(v) = 150_000  +  (85 · Σ_{u→v} (rₜ(u) div outdeg(u))) div 100
  *
  * i.e. damping 0.85 and teleport 0.15 at a 10⁶ scale, with truncating
  * integral division at both the per-edge split and the damping step.
  * Order-free integer sums + truncating div = bit-identical results on
  * any engine (Spark `div`, DuckDB `//` — both truncate toward zero on
  * the non-negative values used here). Dangling mass is NOT
  * redistributed (the damped-sink variant): a node with no out-edges
  * simply absorbs; callers wanting the stochastic-matrix variant can
  * add reverse edges, as the q100 bipartite graph does.
  *
  * Scale shape: one `outdeg` aggregation up front, then per iteration
  * exactly two shuffles — the edges⋈ranks equi-join on `src` and the
  * contribution `groupBy(dst)` with map-side partial sums. Edges are
  * the big side and never move more than once per round; ranks are
  * node-sized. Lineage is truncated every round (`localCheckpoint`, or
  * reliable `checkpoint` when a dir is given — the connectedComponents
  * convention at Dedup.scala:546) so a 50-iteration run plans as 50
  * small jobs, not one exponential tree. Overflow headroom: Σ ranks
  * stays ≤ n·10⁶, so the damping multiply is < 2⁶³ up to ~10¹² nodes.
  */
object PageRank {

  /** `edges`: directed (src, dst) columns of any equatable type
    * (integral ids at scale — half the shuffle width of strings);
    * self-loops allowed, duplicates meaningful (a doubled edge carries
    * double weight — pass `.distinct()` input for simple-graph
    * semantics). Returns one row per node appearing anywhere in
    * `edges`: (node, rank_mu). */
  def run(edges: DataFrame, nIters: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(nIters >= 0, "nIters must be non-negative")
    requireSameKeyType(edges)
    val sc = edges.sparkSession.sparkContext
    checkpointDir.foreach { d =>
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
    }
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)

    // The edge table is the big thing in this algorithm; it is stored
    // EXACTLY ONCE. Node ids keep the caller's type (integral ids halve
    // the shuffle bytes vs strings — encode composite identities
    // numerically at scale). Build: hash-partition by src FIRST, cache,
    // then derive outdeg and the degree-annotated edge list WITHOUT
    // further shuffles (groupBy src and join on src both reuse the
    // partitioning); checkpointed Datasets keep their outputPartitioning,
    // so every round's edges⋈ranks join shuffles only the node-sized
    // ranks side — the edge table never moves again (the q94 write-once
    // amortization, in-memory form). The scratch copy is unpersisted as
    // soon as eDeg/nodes materialize, so peak storage is one edge table.
    val e0 = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = truncate(e0.join(deg, "src"))
    val nodes = truncate(
      e0.select(col("src").as("node")).unionByName(e0.select(col("dst").as("node")))
        .distinct())
    e0.unpersist(false)

    val spine = nodes.withColumn("tele", lit(150000L))
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to nIters)
      ranks = truncate(round(eDeg, spine, ranks))
    ranks.select(col("node"), col("r").as("rank_mu"))
  }

  /** WEIGHTED PageRank — rank mass distributes proportionally to edge
    * weight instead of uniformly:
    *
    *   rₜ₊₁(v) = 150_000 + (85 · Σ_{u→v} ((rₜ(u) · w_e) div W_u)) div 100
    *
    * with W_u = Σ out-edge weights of u — the realistic form for trade
    * and link graphs, where q100's `.distinct()` throws away exactly
    * the multiplicity this variant consumes. Same all-integer
    * recurrence discipline (truncating div; order-free long sums), so
    * the fixpoint stays oracle-checkable (q175 unrolls it in SQL).
    * Weights must be POSITIVE integers — rejected loudly (a zero-total
    * node would divide by zero; negative mass never converges).
    * Overflow headroom: per-term r·w ≤ (1e6·|V|)·max-w must stay ≪ 2⁶³
    * — ~1e4 max-w at a billion nodes, stated. Same 2-shuffle round
    * shape and lineage truncation as [[run]]. */
  def runWeighted(edges: DataFrame, nIters: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(nIters >= 0, "nIters must be non-negative")
    requireSameKeyType(edges)
    val sc = edges.sparkSession.sparkContext
    checkpointDir.foreach { d =>
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
    }
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)
    val e0 = edges.select(col("src"), col("dst"), col("w").cast("long").as("w"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded check; isNull clause because null <= 0 is null (filtered
    // out) — a NULL weight must fail as loudly as a non-positive one,
    // not silently deflate ranks through sum()'s null-dropping
    val bad = e0.filter(col("w").isNull || col("w") <= 0L).limit(1).collect()
    require(bad.isEmpty,
      s"runWeighted: null or non-positive edge weight ${bad.headOption.map(_.get(2))} — " +
        "weights must be positive integers")
    val wsum = e0.groupBy("src").agg(sum(col("w")).as("wtot"))
    val eW = truncate(e0.join(wsum, "src"))
    val nodes = truncate(
      e0.select(col("src").as("node")).unionByName(e0.select(col("dst").as("node")))
        .distinct())
    e0.unpersist(false)
    val spine = nodes.withColumn("tele", lit(150000L))
    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to nIters) {
      val sums = eW.join(ranks, eW("src") === ranks("node"))
        .select(eW("dst"), expr("(r * w) div wtot").as("c"))
        .groupBy("dst").agg(sum("c").as("s"))
      ranks = truncate(
        spine.join(sums, spine("node") === sums("dst"), "left")
          .select(spine("node"),
            (spine("tele") + expr("(85 * coalesce(s, 0L)) div 100")).as("r")))
    }
    ranks.select(col("node"), col("r").as("rank_mu"))
  }

  /** Personalized PageRank — relevance TO a seed set rather than global
    * authority (crawl-seed expansion: "which domains matter from these
    * trusted starting points?"): the teleport mass returns ONLY to the
    * seeds —
    *
    *   r₀(v)   = seed(v) ? 1_000_000 : 0
    *   rₜ₊₁(v) = (seed(v) ? 150_000 : 0)
    *             + (85 · Σ_{u→v} (rₜ(u) div outdeg(u))) div 100
    *
    * — the same all-integer recurrence as [[run]] with a seed-indicator
    * teleport, so it stays oracle-checkable (q122 unrolls it in SQL).
    * Same per-round scale shape and lineage truncation. */
  def runPersonalized(edges: DataFrame, seeds: DataFrame, nIters: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(nIters >= 0, "nIters must be non-negative")
    requireSameKeyType(edges)
    val seedT = seeds.schema("node").dataType
    require(seedT == edges.schema("src").dataType,
      s"seed node type $seedT must equal the edge key type (cast explicitly)")
    val sc = edges.sparkSession.sparkContext
    checkpointDir.foreach { d =>
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
    }
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)
    val e0 = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = truncate(e0.join(deg, "src"))
    // seed membership rides the node spine as the per-node teleport —
    // one broadcast-small join at build time, zero per-round cost
    val sd = seeds.select(col("node")).distinct()
      .withColumn("__isSeed", lit(true))
    val spine = truncate(
      e0.select(col("src").as("node")).unionByName(e0.select(col("dst").as("node")))
        .distinct()
        .join(sd, Seq("node"), "left")
        .select(col("node"),
          when(col("__isSeed"), lit(150000L)).otherwise(lit(0L)).as("tele")))
    e0.unpersist(false)

    var ranks = spine.select(col("node"),
      when(col("tele") > 0L, lit(1000000L)).otherwise(lit(0L)).as("r"))
    for (_ <- 1 to nIters)
      ranks = truncate(round(eDeg, spine, ranks))
    ranks.select(col("node"), col("r").as("rank_mu"))
  }

  /** [[run]] with convergence termination: integer ranks make the
    * between-round L1 delta EXACTLY computable (Σ|rₜ₊₁ − rₜ|, a
    * node-sized join + sum — cheap next to the round itself), so the
    * loop stops at the first round whose delta ≤ `tolMu` instead of
    * always burning `maxIters`. At tolMu = 0 that is a TRUE fixpoint —
    * every further round reproduces the same ranks bit-for-bit, so
    * early stop is answer-invariant (regular graphs converge in one
    * round; the damped recurrence contracts geometrically elsewhere).
    * Returns (ranks, roundsRun). */
  def runToFixpoint(edges: DataFrame, maxIters: Int, tolMu: Long = 0L,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    require(maxIters >= 0 && tolMu >= 0, "maxIters and tolMu must be non-negative")
    requireSameKeyType(edges)
    val sc = edges.sparkSession.sparkContext
    checkpointDir.foreach { d =>
      if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(d)
    }
    def truncate(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(true) else df.localCheckpoint(true)
    val e0 = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = e0.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val eDeg = truncate(e0.join(deg, "src"))
    val nodes = truncate(
      e0.select(col("src").as("node")).unionByName(e0.select(col("dst").as("node")))
        .distinct())
    e0.unpersist(false)

    val spine = nodes.withColumn("tele", lit(150000L))
    var ranks = nodes.withColumn("r", lit(1000000L))
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      it += 1
      val next = truncate(round(eDeg, spine, ranks))
      val delta = next.as("n").join(ranks.as("p"), col("n.node") === col("p.node"))
        .agg(coalesce(sum(abs(col("n.r") - col("p.r"))), lit(0L)).as("d"))
        .head.getLong(0)
      ranks = next
      converged = delta <= tolMu
    }
    (ranks.select(col("node"), col("r").as("rank_mu")), it)
  }

  /** Mismatched src/dst types would make the union'd node spine (and the
    * per-round joins) lean on implicit cross-type coercion — which can
    * silently null a join instead of failing. Misuse fails loudly. */
  private[graft] def requireSameKeyType(edges: DataFrame): Unit = {
    val st = edges.schema("src").dataType
    val dt = edges.schema("dst").dataType
    require(st == dt, s"edge key types must match: src is $st, dst is $dt " +
      "(cast one side explicitly — integral ids halve shuffle width vs strings)")
  }

  /** One power-iteration round as a declarative plan: the edges⋈ranks
    * equi-join on src, the map-side-combined contribution sum on dst,
    * and the node-spine left join applying the spine's per-node
    * teleport (`tele` column — constant 150000 for [[run]], the seed
    * indicator for [[runPersonalized]]) + damping. */
  private[graft] def round(eDeg: DataFrame, nodes: DataFrame,
      ranks: DataFrame): DataFrame = {
    val sums = eDeg.join(ranks, eDeg("src") === ranks("node"))
      .select(eDeg("dst"), expr("r div outdeg").as("c"))
      .groupBy("dst").agg(sum("c").as("s"))
    nodes.join(sums, nodes("node") === sums("dst"), "left")
      .select(nodes("node"),
        (nodes("tele") + expr("(85 * coalesce(s, 0L)) div 100")).as("r"))
  }

  /** The un-truncated round-1 plan over raw `edges` — what PlanCheck
    * audits (run()'s per-round checkpoints erase the join structure
    * from the final query plan by design). */
  private[graft] def auditRound(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    round(e.join(deg, "src"), nodes.withColumn("tele", lit(150000L)),
      nodes.withColumn("r", lit(1000000L)))
  }
}
