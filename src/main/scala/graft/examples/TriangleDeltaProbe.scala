package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** A/B measurement for incremental triangle counting (q221, SURVEY §6):
  * what does ONE edge-batch increment cost through the delta-anchored
  * enumeration ([[graft.ops.Triangles.deltaPerNode]]) versus the full
  * recount over standing ∪ delta that a pipeline without the
  * incremental path pays? Both paths produce the same per-node
  * increment (asserted — the recount-diff identity).
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.examples.TriangleDeltaProbe"
  *
  * Two-axis mode (the q147/q192 discipline): `TriangleDeltaProbe fixed N`
  * restricts the DELTA to orders with l_orderkey < N. Co-purchase edges
  * are pure functions of the lineitem rows, so the SAME absolute delta
  * rides against standing graphs of any scale — the claim under test is
  * that the probe's wedge work follows the DELTA (fixed here) plus one
  * linear standing term, while the recount's wedge term follows the
  * CORPUS superlinearly.
  */
object TriangleDeltaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fixedCut: Option[Long] = args.toSeq match {
      case Seq("fixed", n) => Some(n.toLong)
      case _ => None
    }
    val spark = GraftSession()
    import spark.implicits._
    def copurchase(pred: org.apache.spark.sql.Column) = {
      val li = Tables.load(spark, sfDir, "lineitem").filter(pred)
        .select($"l_orderkey".as("ok"), $"l_partkey".as("pk"))
        .distinct()
      li.select($"ok", $"pk".as("a"))
        .join(li.select($"ok", $"pk".as("b")), "ok")
        .filter($"a" =!= $"b").select("a", "b")
    }
    val standing = copurchase($"l_orderkey" % 10 === 0)
    val deltaPred = fixedCut
      .map(c => $"l_orderkey" % 100 === 15 && $"l_orderkey" < c)
      .getOrElse($"l_orderkey" % 100 === 15)
    val delta = copurchase(deltaPred)

    val osBean = java.lang.management.ManagementFactory
      .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    def time[A](label: String)(f: => A): A = {
      val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
      val r = f
      println(f"[tri-probe] $label%-32s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%7.2f s")
      r
    }
    spark.range(1000).count() // JVM warm-up

    println(s"[tri-probe] standing=${standing.count()} edge rows, " +
      s"delta=${delta.count()} edge rows")

    val full = time("FULL recount(S u D) - recount(S)") {
      val after = graft.ops.Triangles
        .countPerNode(standing.unionByName(delta))
        .as[(Long, Long)].collect().toMap
      val before = graft.ops.Triangles.countPerNode(standing)
        .as[(Long, Long)].collect().toMap
      after.map { case (n, c) => n -> (c - before.getOrElse(n, 0L)) }
        .filter(_._2 > 0)
    }
    val inc = time("DELTA deltaPerNode (probe)") {
      graft.ops.Triangles.deltaPerNode(standing, delta)
        .as[(Long, Long)].collect().toMap
    }
    require(inc == full,
      s"paths disagree: missing=${(full.toSet -- inc.toSet).size} " +
        s"extra=${(inc.toSet -- full.toSet).size}")
    println(s"[tri-probe] increments identical: ${inc.size} nodes gain triangles")
    spark.stop()
  }
}
