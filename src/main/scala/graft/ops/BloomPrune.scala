package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction: shrink the shuffled side of a big
  * join BEFORE the exchange, using a compact sketch of the other side's
  * join keys (the classic semi-join reduction of distributed query
  * processing; Spark itself injects the same pair of expressions in its
  * AQE runtime-filter rule, but only behind size/selectivity heuristics —
  * this operator is the explicit, caller-controlled form, re-expressing
  * the reference's "filter one table by another's keys" step
  * (SQL_DATA_INTEGRATION_TOOL.py:269-280 ad-hoc IN-subqueries) at scale).
  *
  * Why it matters at 100 TB: a fact-dim join where the dim subset matches
  * 1% of fact rows still shuffles 100% of the fact side first. A bloom of
  * the dim keys is megabytes regardless of fact size (1M keys at 1% fpp
  * ≈ 1.2 MB), evaluates in the scan stage as a codegen'd predicate, and
  * drops ~99% of the shuffle bytes for the cost of one aggregate over the
  * (small) key side. False positives only let extra rows through — the
  * join itself stays exact — so correctness never depends on the sketch.
  *
  * Build is fully distributed (Spark's [[BloomFilterAggregate]], an
  * XxHash64-keyed sketch merged map-side); only the finished ~MB sketch
  * is collected, never the keys. Bound the sketch size by `expectedKeys`:
  * optimalNumOfBits(1e6, 0.01) ≈ 9.6 Mbit ≈ 1.2 MB.
  */
object BloomPrune {

  /** Distributed-build bloom of `keyCol` over `keys`, returned as the
    * serialized sketch (one row — the sketch itself — leaves the cluster). */
  def bloomOf(keys: DataFrame, keyCol: Column, expectedKeys: Long,
      fpp: Double = 0.01): Array[Byte] = {
    require(expectedKeys > 0, s"expectedKeys must be positive: $expectedKeys")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedKeys, fpp)
    val agg = new BloomFilterAggregate(bridge.expression(xxhash64(keyCol)),
      Literal(expectedKeys), Literal(numBits)).toAggregateExpression()
    keys.select(bridge.column(agg).as("bf")).head.getAs[Array[Byte]](0)
  }

  /** Membership predicate against a built sketch — a codegen'd
    * [[BloomFilterMightContain]], so it runs inside the scan's
    * whole-stage-codegen span, before any exchange. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    bridge.column(BloomFilterMightContain(
      Literal.create(bloom, BinaryType), bridge.expression(xxhash64(key))))

  /** `fact` reduced to rows whose `factKey` might be in `keys.keyCol` —
    * false positives possible (≈fpp), false negatives never. Follow with
    * the exact join; an empty key side yields a null sketch whose
    * predicate drops every row, matching the empty exact join. */
  def semiPrune(fact: DataFrame, factKey: Column,
      keys: DataFrame, keyCol: Column,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame =
    fact.filter(mightContain(bloomOf(keys, keyCol, expectedKeys, fpp), factKey))
}
