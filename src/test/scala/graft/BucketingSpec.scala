package graft

import org.apache.spark.sql.functions._
import graft.ops.Bucketing
import graft.sources.Tables

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join runs without a shuffle exchange and matches plain join") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force SMJ path
    try {
      val orders = Tables.load(spark, sfDir, "orders")
      val lineitem = Tables.load(spark, sfDir, "lineitem")
      Bucketing.writeBucketed(orders.select($"o_orderkey", $"o_totalprice"),
        "b_orders", "o_orderkey", buckets = 8)
      Bucketing.writeBucketed(
        lineitem.select($"l_orderkey".as("o_orderkey"), $"l_quantity"),
        "b_lineitem", "o_orderkey", buckets = 8)

      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      assert(Bucketing.isExchangeFree(joined),
        "bucketed join should not exchange:\n" + joined.queryExecution.executedPlan)

      val n = joined.count()
      val plainN = orders.join(lineitem, $"o_orderkey" === $"l_orderkey").count()
      assert(n == plainN)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 64 * 1024 * 1024)
    }
  }
}
