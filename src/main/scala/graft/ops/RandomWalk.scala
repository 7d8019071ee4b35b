package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic truncated random walks — the corpus generator for
  * graph-embedding training (DeepWalk, Perozzi KDD'14; node2vec's p=q=1
  * case): one fixed-length walk per start node, each step choosing a
  * uniform neighbor. The walks ARE the training text a skip-gram model
  * consumes, so a 100 TB link graph needs this pass exactly like a text
  * corpus needs tokenization.
  *
  * "Random" is md5-derived and therefore DETERMINISTIC and
  * engine-portable (the repo's sampling convention, q47/q138): step t
  * of the walk started at w picks neighbor index
  * md5_60("walk:" w ":" t) mod outdeg(cur) under the (dst ASC) total
  * order of cur's neighbor list. Reruns, repartitionings, and the
  * DuckDB oracle all produce identical walks — no seed state, no RNG
  * stream coupled to partition layout (the property that makes
  * distributed "random" walks replayable at all).
  *
  * Scale shape: the adjacency is materialized ONCE as (src, pos, dst)
  * where pos is dst's rank in src's neighbor list, with SKEW-SPLIT
  * ranking (the salted-join discipline applied to a window): nodes of
  * degree ≤ hubDegree rank with an ordinary per-src window — bounded
  * sort tasks, zero extra cost on hub-free graphs — while hubs rank
  * BANDED (the q143 skyline discipline): neighbors band on dst's high
  * bits (arithmetic shift — order-preserving, negatives included),
  * rank within (src, band) in parallel tasks, then add the per-src
  * prefix-sum of lower-band counts — global rank = band offset +
  * in-band rank exactly because banding preserves the dst order. A
  * hub's per-src sequential work drops from outdeg(src) rows (one sort
  * task for a 10⁸-degree hub) to its occupied-band count
  * (≥2^bandShift× smaller on dense id spaces); an adversary spreading
  * one neighbor per band degrades it back — stated, and recoverable by
  * raising bandShift. Each step is
  * then two node-sized equi-joins (state ⋈ outdeg on the current node
  * to form the choice index, then ⋈ adjacency on (node, pos)) — the
  * PageRank 2-shuffles-per-round discipline, with per-step lineage
  * truncation. Walk storage is answer-sized: steps land as columns,
  * one row per walk. Dangling nodes (no out-edges) stop their walk:
  * remaining steps stay NULL — stated, not silently resampled.
  */
object RandomWalk {

  /** One `steps`-step walk per distinct start node of `edges` (every
    * node with at least one out-edge). Returns
    * (walk_id = start node, step_1, ..., step_`steps`), NULL from the
    * first step that reaches a node without out-edges. */
  def walks(edges: DataFrame, srcCol: String, dstCol: String,
      steps: Int, bandShift: Int = 8, hubDegree: Long = 1L << 22): DataFrame = {
    require(steps >= 1 && steps <= 64, s"steps must be in [1, 64], got $steps")
    require(bandShift >= 0 && bandShift <= 62, s"bandShift in [0,62], got $bandShift")
    require(hubDegree >= 2, s"hubDegree must be >= 2, got $hubDegree")
    // materialized once: the skew-split consumes the edge set from
    // several branches (outdeg, plain rank, hub rank, band offsets) and
    // its upstream derivation must not replay per branch
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct()
      .localCheckpoint()
    PageRank.requireSameKeyType(e)
    // (src, pos, dst): neighbor lists indexed under the dst total order.
    // Skew-split ranking (the Skew.saltedJoin discipline): nodes below
    // hubDegree rank with one per-src window — their sort task is
    // bounded by hubDegree, and on a hub-free graph this is the WHOLE
    // graph at zero extra cost (measured: the always-banded variant
    // cost 2.4x cpu on q144's hub-free graph). Hubs rank BANDED (see
    // scaladoc): band = dst >> bandShift (arithmetic shift — order-
    // preserving for signed ids), in-band rank in parallel tasks, plus
    // the per-src prefix-sum of lower-band counts.
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    // statistics-driven plan choice (the AQE idea at operator level):
    // one bounded driver check on the node-sized degree table; the
    // common hub-free graph then ranks with the single plain window
    // and pays nothing for the skew machinery it doesn't need
    val hasHubs = outdeg.filter(col("outdeg") > hubDegree).limit(1).count() > 0
    val wPlain = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dst"))
    def plainRank(edges: DataFrame) = edges.select(col("src"),
      (row_number().over(wPlain) - 1).cast("long").as("pos"), col("dst"))
    val adj = (if (!hasHubs) plainRank(e)
    else {
      val eTag = e.join(outdeg, Seq("src"))
      val smallAdj = plainRank(eTag.filter(col("outdeg") <= hubDegree))
      val hubEdges = eTag.filter(col("outdeg") > hubDegree)
        .withColumn("band", shiftright(col("dst").cast("long"), bandShift))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src"), col("band")).orderBy(col("dst"))
      val inBand = hubEdges.withColumn("bpos", (row_number().over(wb) - 1).cast("long"))
      // per-src offset of each band = prefix sum of lower-band counts;
      // the only per-src sequential pass, over occupied-band rows
      val wp = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("band"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val bandOff = hubEdges.groupBy(col("src"), col("band"))
        .agg(count(lit(1)).as("bn"))
        .withColumn("boff", coalesce(sum(col("bn")).over(wp), lit(0L)))
        .select(col("src"), col("band"), col("boff"))
      val hubAdj = inBand.join(bandOff, Seq("src", "band"))
        .select(col("src"), (col("boff") + col("bpos")).as("pos"), col("dst"))
      smallAdj.unionByName(hubAdj)
    }).localCheckpoint()
    // Per-step cost note: the state ⋈ adjacency join re-shuffles the
    // EDGE-sized adjacency each step (a checkpointed RDD's partitioning
    // does not satisfy the join's required distribution — measured: an
    // explicit pre-repartition just adds its own shuffle). At cluster
    // scale the fix is landing adj ONCE as a table bucketed by
    // (src, pos): every step then shuffles only the node-sized state.
    // md5_60: the top 60 bits of md5 as a long — the repo's portable
    // hash convention (rederivable in any engine with md5 + substr)
    def md5_60(c: org.apache.spark.sql.Column) =
      conv(substring(md5(c), 1, 15), 16, 10).cast("long")
    // the walk row carries its step columns along — answer-sized
    // (≤ steps extra columns). Each step's state feeds ONLY the next
    // step, so truncation exists to bound the accumulating plan tree,
    // not to avoid recomputation — checkpoint every few steps (plan
    // depth stays bounded) instead of per step, which materialized the
    // full walk table `steps` times (measured on a 3-step run: 5.2 →
    // 3.5 s at 16k walks; 54 → 46 s at 480k walks, where the adjacency
    // build dominates). The final state stays lazy for the caller.
    val checkpointEvery = 4
    var state = outdeg.select(col("src").as("walk_id"), col("src").as("cur"))
    for (t <- 1 to steps) {
      val choice = pmod(
        md5_60(concat(lit("walk:"), col("walk_id").cast("string"), lit(s":$t"))),
        col("outdeg"))
      val kept = state.columns.filter(_ != "cur").map(col)
      state = state
        .join(outdeg.withColumnRenamed("src", "cur"), Seq("cur"), "left")
        .withColumn("pos", when(col("outdeg").isNotNull, choice))
        .join(adj.select(col("src").as("cur"), col("pos"),
          col("dst").as("nxt")), Seq("cur", "pos"), "left")
        .select(kept :+ col("nxt").as(s"step_$t") :+ col("nxt").as("cur"): _*)
      if (t % checkpointEvery == 0 && t < steps) state = state.localCheckpoint()
    }
    state.drop("cur")
  }
}
