package graft.functions

import org.apache.spark.sql.Column

/** Public wrappers for the native aggregate kernels (implementation in
  * org.apache.spark.sql.graft — they need private[sql] Catalyst types). */
object AggFunctions {
  /** Bounded top-k aggregate: the k highest-score (score, id) pairs per
    * group as a sorted array<struct<score, id>>, distinct by id, ties
    * preferring the smaller id. Partial-aggregates map-side, so grouped
    * top-k shuffles |tasks|×|groups|×k entries instead of every row. */
  def scoredTopK(score: Column, id: Column, k: Int): Column =
    org.apache.spark.sql.graft.ScoredTopK(score, id, k)

  /** Element-wise max over array<int> rows — the HLL register-union
    * semilattice as ONE aggregate expression (constant-size plan at any
    * register count; map-side partial; mergeable/streamable). */
  def regMax(regs: Column): Column =
    org.apache.spark.sql.graft.RegMaxInts(regs)
}
