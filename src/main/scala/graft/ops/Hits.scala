package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg, JACM 1999 — "Authoritative
  * sources in a hyperlinked environment"): the OTHER classic link-
  * analysis ranking next to [[PageRank]], and the one whose two-sided
  * structure matters on crawl graphs — a page is a good HUB when it
  * links to good authorities, a good AUTHORITY when good hubs link to
  * it. On the repo's supplier→customer trade graph the two sides are
  * literal: suppliers can only be hubs, customers only authorities.
  *
  * Exactness across engines is the design constraint (the q100 rule):
  * the classic L2 normalization is float, so this implementation
  * normalizes by the MAXIMUM instead — scores live in integer
  * micro-units of the round's best score,
  *
  *   a_{t+1}(v) = (Σ_{u→v} h_t(u)) · 10⁶ div max_w Σ h_t  ,
  *   h_{t+1}(u) = (Σ_{u→v} a_{t+1}(v)) · 10⁶ div max ...
  *
  * — order-free integer sums, truncating integral division, NO float
  * anywhere (stronger than §5's decimal protocol). Max-normalization
  * preserves the ranking ORDER of the L2 variant exactly (both divide
  * every score by one positive round constant); only the scale
  * differs, and the scale is part of the stated contract.
  *
  * Scale shape (the PageRank discipline): the edge table is stored
  * once; per half-iteration exactly two shuffles — the edges⋈scores
  * equi-join on the message key and the map-side-combined groupBy on
  * the receiving key; the round max is a 1-row aggregate broadcast
  * back (never a window). Lineage truncates every half-round. Overflow
  * headroom: score sums ≤ n·10⁶, the ×10⁶ multiply is < 2⁶³ up to
  * ~10⁶ nodes of in-degree mass per node — stated, not assumed.
  */
object Hits {

  /** `edges`: directed (src, dst). Returns (node, auth_u, hub_u) for
    * every node appearing anywhere in `edges`, after `nIters` full
    * authority+hub rounds. */
  def run(edges0: DataFrame, nIters: Int = 2): DataFrame = {
    require(nIters >= 1, "nIters must be >= 1")
    val edges = edges0.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    var hub = nodes.withColumn("h", lit(1000000L))
    var auth: DataFrame = null
    for (_ <- 1 to nIters) {
      val araw = edges.join(hub.select(col("node").as("src"), col("h")), Seq("src"))
        .groupBy(col("dst")).agg(sum(col("h")).as("ar"))
        .select(col("dst").as("node"), col("ar"))
      val amax = araw.agg(max(col("ar")).as("m"))
      auth = nodes.join(araw, Seq("node"), "left")
        .crossJoin(broadcast(amax)) // 1-row round constant
        .select(col("node"), expr("coalesce(ar, 0L) * 1000000L DIV m").as("a"))
        .localCheckpoint(true)
      val hraw = edges.join(auth.select(col("node").as("dst"), col("a")), Seq("dst"))
        .groupBy(col("src")).agg(sum(col("a")).as("hr"))
        .select(col("src").as("node"), col("hr"))
      val hmax = hraw.agg(max(col("hr")).as("m"))
      hub = nodes.join(hraw, Seq("node"), "left")
        .crossJoin(broadcast(hmax))
        .select(col("node"), expr("coalesce(hr, 0L) * 1000000L DIV m").as("h"))
        .localCheckpoint(true)
    }
    auth.join(hub, Seq("node"))
      .select(col("node"), col("a").as("auth_u"), col("h").as("hub_u"))
  }
}
