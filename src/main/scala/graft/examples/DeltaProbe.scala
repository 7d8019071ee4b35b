package graft.examples

import org.apache.spark.sql.functions._

import graft.GraftSession
import graft.sources.Tables

/** A/B measurement for incremental dedup (q147, SURVEY §6): what does
  * ONE crawl increment cost through the persisted-index probe
  * ([[graft.dedup.DeltaDedup.deltaPairs]]) versus re-running the full
  * [[graft.dedup.Dedup.minHashPairs]] over corpus ∪ delta — the cost a
  * pipeline without a standing index pays per increment? Both paths
  * produce the same delta-touching pair set (asserted).
  *
  * Run: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.examples.DeltaProbe"
  *
  * Scale-triple mode (SURVEY §6, VERDICT r11 #6): `DeltaProbe fixed N`
  * restricts the delta to source docs with doc_id < N. GenData texts are
  * pure functions of doc_id, so the SAME absolute delta rides against
  * corpora of any scale — the architectural claim under test is that
  * probe cost follows the DELTA (fixed here), while the no-index
  * full-repair baseline follows the CORPUS.
  */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fixedCut: Option[Long] = args.toSeq match {
      case Seq("fixed", n) => Some(n.toLong)
      case _ => None
    }
    val spark = GraftSession()
    import spark.implicits._
    val docs = Tables.load(spark, sfDir, "documents").select($"doc_id", $"text")
    val norm = trim(regexp_replace(lower($"text"), "\\s+", " "))
    val srcDocs = fixedCut.map(c => docs.filter($"doc_id" < c)).getOrElse(docs)
    val delta = srcDocs
      .filter($"doc_id" % 13 === 0 && size(split(norm, " ")) >= 20)
      .select(($"doc_id" + 3000000).as("doc_id"),
        concat($"text", lit(" fresh crawl revision tag")).as("text"))
      .unionByName(srcDocs.filter($"doc_id" % 19 === 0)
        .select(($"doc_id" + 4000000).as("doc_id"),
          concat($"text", lit("  ")).as("text")))
    val osBean = java.lang.management.ManagementFactory
      .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    def time[A](label: String)(f: => A): A = {
      val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
      val r = f
      println(f"[delta-probe] $label%-28s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s" +
        f"  cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%7.2f s")
      r
    }
    spark.range(1000).count() // JVM warm-up

    val nC = docs.count(); val nD = delta.count()
    println(s"[delta-probe] corpus=$nC docs, delta=$nD docs (${100.0 * nD / nC}%)")

    val full = time("FULL minHashPairs(C u D)") {
      graft.dedup.Dedup.minHashPairs(docs.unionByName(delta), "text", "doc_id",
          threshold = 0.5)
        .filter($"id_a" >= 3000000 || $"id_b" >= 3000000)
        .as[(Long, Long, Double)].collect().toSet
    }
    val path = graft.Scratch.dir("graft_lsh_probe").toString
    time("index build (once/corpus)") {
      graft.dedup.DeltaDedup.buildIndex(docs, "text", "doc_id", path)
    }
    val inc = time("DELTA deltaPairs (probe)") {
      graft.dedup.DeltaDedup.deltaPairs(spark, path, delta, "text", "doc_id",
          threshold = 0.5)
        .as[(Long, Long, Double)].collect().toSet
    }
    require(inc == full,
      s"paths disagree: missing=${(full -- inc).size} extra=${(inc -- full).size}")
    println(s"[delta-probe] pair sets identical: ${inc.size} pairs")
    spark.stop()
  }
}
