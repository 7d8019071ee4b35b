package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions registers SQL functions") {
    // extensions only apply at session creation — stop any shared session
    // first (TestSession rebuilds lazily for later suites)
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val r = spark.sql(
        "SELECT float_vec_dot(array(cast(1.0 as float), cast(2.0 as float))," +
          " array(cast(3.0 as float), cast(4.0 as float))) AS d").head().getDouble(0)
      assert(r == 11.0)
      val sh = spark.sql("SELECT simhash64(array(1L, 3L, 3L)) AS s").head().getLong(0)
      assert(sh == 3L) // bits 0 and 1 win the vote (two 3s beat one 1 on bit 1)

      // ApproxDistinctRule: off by default (exact), HLL++ when enabled
      spark.range(1000).createOrReplaceTempView("r1k")
      val exact = spark.sql("SELECT COUNT(DISTINCT id) AS n FROM r1k").head().getLong(0)
      assert(exact == 1000L)
      spark.conf.set("spark.graft.approxDistinct.enabled", "true")
      val df = spark.sql("SELECT COUNT(DISTINCT id) AS n FROM r1k")
      assert(df.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
      val approx = df.head().getLong(0)
      assert(math.abs(approx - 1000L) < 150, s"approx=$approx")
      spark.conf.set("spark.graft.approxDistinct.enabled", "false")
    } finally {
      // don't leak this untuned session (200 shuffle partitions) into the
      // suites that follow — TestSession rebuilds the tuned one on demand
      spark.stop()
    }
  }
}
