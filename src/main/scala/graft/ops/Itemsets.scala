package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining, pairwise level (Agrawal & Srikant VLDB'94,
  * the a-priori family): which items co-occur in the same basket more
  * often than a support threshold — co-purchased brands, co-cited
  * sources, co-occurring tags. Distinct from [[CommonNeighbors]] (which
  * SCORES a fixed pair list by shared neighbors) and from q119's
  * collocations (ADJACENT token bigrams): itemsets count unordered
  * co-membership at basket granularity with the relative-support /
  * lift semantics downstream rule mining expects.
  *
  * Support is RELATIVE — a pair is frequent iff it appears in at least
  * `minSupPerMyriad`/10000 of all baskets — so the same call means the
  * same thing at sf0.001 and at 100 TB. The threshold arithmetic is
  * all-integer (n·10000 ≥ minSup·nBaskets; the basket total rides a
  * broadcast 1-row join, the q89 convention — no collect, no literal
  * baked at plan time).
  *
  * Shape: (basket, item) distinct pass → item counts (vocabulary-sized)
  * → a-priori prune (an item below threshold can't be in any frequent
  * pair — on sparse vocabularies this is the load-bearing step that
  * keeps the pair join small; on dense ones it's a no-op and costs one
  * vocabulary-sized join) → per-basket pair self-join on the basket key
  * with map-side-combined (a, b) counts. The honest cost is Σ_b |b|²
  * wedges over PRUNED basket sizes (the q107/q137 discipline); baskets
  * are small in market-basket workloads, and the a-priori prune is what
  * bounds |b| when the raw basket is long but mostly rare items.
  * Lift = nBaskets·n_ab / (n_a·n_b): exact long operands, one IEEE
  * division — hash-checkable cross-engine.
  */
object Itemsets {

  /** Frequent item pairs over `baskets`: (item_a, item_b, n_ab, n_a,
    * n_b, lift), item_a < item_b, both items and the pair at or above
    * `minSupPerMyriad`/10000 relative support. Ordered (item_a, item_b). */
  def frequentPairs(baskets: DataFrame, basketCol: String, itemCol: String,
      minSupPerMyriad: Long): DataFrame = {
    require(minSupPerMyriad >= 1 && minSupPerMyriad <= 10000,
      s"minSupPerMyriad must be in [1, 10000], got $minSupPerMyriad")
    val items = baskets
      .select(col(basketCol).as("bk"), col(itemCol).as("item")).distinct()
    // 1-row basket total, broadcast into every threshold comparison
    val nB = items.agg(countDistinct(col("bk")).as("n_baskets"))
    val itemCounts = items.groupBy(col("item")).agg(count(lit(1)).as("n_i"))
    val freqItems = itemCounts.crossJoin(broadcast(nB))
      .filter(col("n_i") * 10000 >= lit(minSupPerMyriad) * col("n_baskets"))
      .select(col("item"), col("n_i"))
    // a-priori: only frequent items can appear in a frequent pair
    val pruned = items.join(freqItems.select(col("item")), "item")
    val pairs = pruned.select(col("bk"), col("item").as("item_a"))
      .join(pruned.select(col("bk"), col("item").as("item_b")), "bk")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs.crossJoin(broadcast(nB))
      .filter(col("n_ab") * 10000 >= lit(minSupPerMyriad) * col("n_baskets"))
      // item counts are vocabulary-sized — broadcast both lookups
      .join(broadcast(freqItems.select(col("item").as("item_a"),
        col("n_i").as("n_a"))), "item_a")
      .join(broadcast(freqItems.select(col("item").as("item_b"),
        col("n_i").as("n_b"))), "item_b")
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"), col("n_b"),
        ((col("n_baskets") * col("n_ab")).cast("double") /
          (col("n_a") * col("n_b"))).as("lift"))
      .orderBy(col("item_a"), col("item_b"))
  }
}
