package graft.examples

import org.apache.spark.sql.functions._

/** Throwaway-style profiling probe for q130 (kept, like the other
  * examples/ probes, as the reproducible measurement behind SURVEY §6
  * notes): splits q130_label_prop into its stages and reports wall + cpu
  * per stage so ref-vs-code adjudication rests on a measurement. */
object LpaProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession("local[32]", 32)
    val osBean = java.lang.management.ManagementFactory
      .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    def timed[A](name: String)(f: => A): A = {
      val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
      val r = f
      println(f"[lpa] $name%-28s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s  cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%7.2f s")
      r
    }
    spark.range(1000).count()
    val t = (n: String) => graft.sources.Tables.load(spark, sfDir, n)
    // tradePairs inline (not memoized here — measure the build)
    val pairs = timed("tradePairs build+persist") {
      val p = t("lineitem").select(col("l_orderkey"), col("l_suppkey"))
        .join(t("orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey") * 2).as("a"), (col("o_custkey") * 2 + 1).as("b"))
        .distinct().localCheckpoint(true)
      println(s"[lpa] pairs=${p.count()}")
      p
    }
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    import org.apache.spark.sql.DataFrame
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    def seed = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    // current shape: join + groupBy(node,label) + groupBy(node)
    def roundA(labels: DataFrame): DataFrame =
      e.join(labels, e("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
        .unionByName(labels)
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("n"))
        .groupBy(col("node"))
        .agg(max(struct(col("n"), (-col("label")).as("neg"))).as("w"))
        .select(col("node"), (-col("w.neg")).as("label"))
    // fused: repartition(node) once; both aggregates reuse the partitioning
    def roundB(labels: DataFrame): DataFrame =
      e.join(labels, e("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
        .unionByName(labels)
        .repartition(col("node"))
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("n"))
        .groupBy(col("node"))
        .agg(max(struct(col("n"), (-col("label")).as("neg"))).as("w"))
        .select(col("node"), (-col("w.neg")).as("label"))
    // broadcast the node-sized label table into the edge join
    def roundC(labels: DataFrame): DataFrame =
      e.join(broadcast(labels), e("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
        .unionByName(labels)
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("n"))
        .groupBy(col("node"))
        .agg(max(struct(col("n"), (-col("label")).as("neg"))).as("w"))
        .select(col("node"), (-col("w.neg")).as("label"))
    // broadcast + fused
    def roundD(labels: DataFrame): DataFrame =
      e.join(broadcast(labels), e("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
        .unionByName(labels)
        .repartition(col("node"))
        .groupBy(col("node"), col("label")).agg(count(lit(1)).as("n"))
        .groupBy(col("node"))
        .agg(max(struct(col("n"), (-col("label")).as("neg"))).as("w"))
        .select(col("node"), (-col("w.neg")).as("label"))
    for ((nm, rd) <- Seq("A cur" -> roundA _, "B fuse" -> roundB _,
        "C bcast" -> roundC _, "D bc+fuse" -> roundD _); rep <- 1 to 2) {
      timed(s"3 rounds $nm #$rep") {
        var l = seed
        for (_ <- 1 to 3) l = rd(l).localCheckpoint(true)
        l.count()
      }
    }
    spark.stop()
  }
}
