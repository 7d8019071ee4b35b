package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-mitigation operators. AQE's skew-join splitting (enabled in
  * GraftSession) handles most runtime skew; these are the declarative tools
  * for the cases AQE can't fix: a single hot *aggregation* key (AQE never
  * splits a reduce key) and broadcast-infeasible joins against a skewed
  * probe side.
  */
object Skew {

  /** Two-stage salted sum/count aggregation: stage 1 groups on
    * (keys, salt) so a hot key spreads over `saltBuckets` reducers; stage 2
    * combines the partials. Both stages are algebraic, so correctness is
    * independent of the salt assignment; decimal-exact sums keep results
    * bit-stable under any split. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol).cast("decimal(18,4)")).as("__psum"),
        count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).cast("double").as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Salted replicate join for a skewed probe side against a small-but-not-
    * broadcastable build side: the build side is replicated `saltBuckets`
    * times (explode), the probe side gets a uniform salt, and the join key
    * becomes (key, salt) — the hot key's rows land on `saltBuckets`
    * different reducers instead of one. */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int = 16): DataFrame = {
    val probeSalted = probe.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets)))
    val buildReplicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<bigint>")))
    probeSalted.join(buildReplicated, Seq(key, "__salt")).drop("__salt")
  }
}
