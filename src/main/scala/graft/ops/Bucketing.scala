package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed co-located joins: write both sides bucketed+sorted on the join
  * key, and every subsequent equi-join on that key runs as a sort-merge
  * join with NO Exchange on either side — at 100 TB this is the difference
  * between re-shuffling the fact table on every join and shuffling it once
  * at write time. (Hive-format bucketed tables in the session catalog;
  * on a cluster this is the same API against the shared metastore.)
  */
object Bucketing {

  /** Persist `df` as a bucketed, in-bucket-sorted table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table) // managed, in spark.sql.warehouse.dir

  /** Join two bucketed tables on their bucket key (exchange-free when both
    * were written with the same bucket count). `forceSortMerge` requests
    * the merge strategy even when one side is small enough to broadcast —
    * the demonstration/audit mode: with matching bucket layouts the
    * "shuffle"-merge join plans with NO exchange on either side, which is
    * exactly the property to pin; production callers leave it false and
    * let the planner broadcast genuinely small sides. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner",
      forceSortMerge: Boolean = false): DataFrame = {
    val left = spark.table(leftTable)
    val l = if (forceSortMerge) left.hint("merge") else left
    l.join(spark.table(rightTable), Seq(key), joinType)
  }

  /** True when the executed plan of `df` contains no shuffle Exchange —
    * the property bucketing buys. Walks the plan tree (through AQE's
    * runtime-final plan) for ShuffleExchangeLike nodes rather than
    * string-matching the rendered plan. */
  def isExchangeFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    // post-execution AQE plans hide materialized shuffles inside leaf
    // ShuffleQueryStageExec nodes — match both forms
    org.apache.spark.sql.graft.bridge.finalPlan(df.queryExecution)
      .collectWithSubqueries {
        case e: ShuffleExchangeLike => e
        case s: ShuffleQueryStageExec => s
      }.isEmpty
  }
}
