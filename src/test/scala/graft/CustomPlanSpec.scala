package graft

import graft.similarity.Ann
import graft.sources.Tables

class CustomPlanSpec extends SparkSpec {
  import spark.implicits._

  test("CosineTopKExec matches the declarative bruteTopK exactly") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val custom = Ann.cosineTopKExec(emb, queries, "embedding", "vec_id", 5)
      .select("q_id", "rk", "n_id").as[(Long, Int, Long)].collect().toSeq.sorted
    val declarative = Ann.bruteTopK(emb, emb.filter($"vec_id" < 5), "embedding", "vec_id", 5)
      .as[(Long, Int, Long)].collect().toSeq.sorted
    assert(custom == declarative)
    // the custom node actually planned through the strategy
    val plan = Ann.cosineTopKExec(emb, queries, "embedding", "vec_id", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("CosineTopK"))
  }

  test("CosineTopKExec on a corpus with many partitions still merges correctly") {
    val emb = Tables.load(spark, sfDir, "embeddings").repartition(13)
    val queries = Tables.load(spark, sfDir, "embeddings").filter($"vec_id" === 7)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect()
    val out = Ann.cosineTopKExec(emb, queries, "embedding", "vec_id", 3)
      .select("q_id", "rk", "n_id").as[(Long, Int, Long)].collect().toSeq.sorted
    val ref = Ann.bruteTopK(Tables.load(spark, sfDir, "embeddings"),
      Tables.load(spark, sfDir, "embeddings").filter($"vec_id" === 7),
      "embedding", "vec_id", 3).as[(Long, Int, Long)].collect().toSeq.sorted
    assert(out == ref)
  }
}
