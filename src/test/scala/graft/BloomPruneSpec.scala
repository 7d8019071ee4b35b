package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomPrune

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("semiPrune never drops a true match and the exact join stays exact") {
    val fact = sources.Tables.load(spark, sfDir, "lineitem")
    val dim = sources.Tables.load(spark, sfDir, "orders")
      .filter($"o_totalprice" > 400000)
    val keys = dim.select($"o_orderkey")
    val nKeys = keys.count()

    val pruned = BloomPrune.semiPrune(fact, $"l_orderkey", keys, $"o_orderkey",
      expectedKeys = math.max(nKeys, 1L), fpp = 0.01)
    val exact = fact.join(keys, $"l_orderkey" === $"o_orderkey", "left_semi")

    // no false negatives: every exact-semi-join row survives the bloom
    assert(exact.join(pruned.select($"l_orderkey", $"l_linenumber"),
      Seq("l_orderkey", "l_linenumber"), "left_anti").isEmpty)
    // the sketch actually prunes: way fewer rows than the full fact side
    val (nFact, nPruned, nExact) = (fact.count(), pruned.count(), exact.count())
    assert(nPruned >= nExact && nPruned < nFact / 2,
      s"fact=$nFact pruned=$nPruned exact=$nExact")
    // pruned + exact join == plain exact join
    val viaBloom = pruned.join(dim, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    val plain = fact.join(dim, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority").count()
      .as[(String, Long)].collect().toMap
    assert(viaBloom == plain)
  }

  test("empty key side prunes everything, matching the empty exact join") {
    val fact = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val keys = Seq.empty[Long].toDF("k")
    assert(BloomPrune.semiPrune(fact, $"k", keys, $"k", expectedKeys = 1L).isEmpty)
  }

  test("the membership predicate is a codegen'd scan-stage filter") {
    val fact = sources.Tables.load(spark, sfDir, "lineitem")
    val keys = sources.Tables.load(spark, sfDir, "orders")
      .filter($"o_totalprice" > 400000).select($"o_orderkey")
    val pruned = BloomPrune.semiPrune(fact, $"l_orderkey", keys, $"o_orderkey",
      expectedKeys = 2000L, fpp = 0.001)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(500))
    // inside a WholeStageCodegen span, not an interpreted filter
    val formatted = org.apache.spark.sql.graft.bridge
      .finalPlan(pruned.queryExecution).toString
    assert(formatted.contains("*"), formatted.take(500)) // codegen stage marker
  }
}
