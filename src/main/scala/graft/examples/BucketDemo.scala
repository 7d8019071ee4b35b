package graft.examples

import graft.GraftSession
import graft.ops.Bucketing
import graft.sources.Tables

/** Bucketed co-located join demo: write orders/lineitem bucketed on the
  * join key, join exchange-free, print the physical plan as proof.
  * Run: sbt "runMain graft.examples.BucketDemo"
  */
object BucketDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[8]", 8)
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_totalprice"), "b_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(Tables.load(spark, dir, "lineitem")
      .select($"l_orderkey".as("o_orderkey"), $"l_quantity"), "b_lineitem", "o_orderkey", 8)
    val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
    println("EXCHANGE-FREE: " + Bucketing.isExchangeFree(joined))
    println("ROWS: " + joined.count())
    println("PLAN:\n" + joined.queryExecution.executedPlan.toString.linesIterator.take(12).mkString("\n"))
    // probe: mismatched bucket counts -> Spark must still be correct (may exchange)
    Bucketing.writeBucketed(Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus"), "b_orders5", "o_orderkey", 5)
    val mixed = Bucketing.bucketedJoin(spark, "b_orders5", "b_lineitem", "o_orderkey")
    println("MIXED-BUCKETS exchangeFree=" + Bucketing.isExchangeFree(mixed) + " rows=" + mixed.count())
    Seq("b_orders", "b_lineitem", "b_orders5").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
