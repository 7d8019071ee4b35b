package graft.examples

import org.apache.spark.sql.functions._

/** Scratch probe for q155 phase timing (dev tool). */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("local[32]", 32)
    import spark.implicits._
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.range(1000).count()
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"l_orderkey").orderBy($"l_linenumber")
      val nat = graft.sources.Tables.load(spark, dir, "lineitem")
        .select($"l_suppkey".as("src"), lead($"l_suppkey", 1).over(w).as("dst"))
        .filter($"dst".isNotNull && $"src" =!= $"dst").distinct()
        .localCheckpoint()
      System.err.println(s"[probe] rep$rep nat=${nat.count()} edges in ${(System.nanoTime()-t0)/1e9}s")
      t0 = System.nanoTime()
      val planted = Seq((9000001L,9000011L),(9000011L,9000012L),(9000012L,9000013L),
        (9000013L,9000011L),(9000013L,9000021L),(9000031L,9000032L),
        (9000032L,9000033L),(9000033L,9000034L)).toDF("src","dst")
      val lab = graft.ops.Scc.scc(nat.unionByName(planted), "src", "dst")
      System.err.println(s"[probe] rep$rep scc=${lab.count()} rows in ${(System.nanoTime()-t0)/1e9}s")
    }
    spark.stop()
  }
}
