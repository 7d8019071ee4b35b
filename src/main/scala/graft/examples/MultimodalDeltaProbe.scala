package graft.examples

import org.apache.spark.sql.functions._
import graft.multimodal.{Multimodal, MultimodalPipeline}

/** Two-axis cost probe for the incremental multimodal ingest (q192) —
  * the q147 DeltaProbe protocol applied to fingerprints: pin a FIXED
  * delta (doc ids below `cap`, deterministic at every GenData sf) and
  * measure, per standing corpus,
  *
  *   full  — the union keep-one closure a recompute pays (fingerprint
  *           EVERYTHING, pair EVERYTHING, close components),
  *   build — the standing class index, paid once per ingested corpus,
  *   probe — deltaVerdicts against the landed index.
  *
  * The architectural claim: probe cpu follows the DELTA (plus one slim
  * index-scan term), not the corpus; full recompute follows the corpus.
  *
  * Run: sbt "runMain graft.examples.MultimodalDeltaProbe <sfDir> [cap]"
  */
object MultimodalDeltaProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cap = if (args.length > 1) args(1).toLong else 5000L
    val spark = graft.GraftSession(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    spark.range(1000).count() // JVM warm-up
    val osBean = java.lang.management.ManagementFactory
      .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    def cpu[T](f: => T): (T, Double) = {
      val c0 = osBean.getProcessCpuTime
      val r = f
      (r, (osBean.getProcessCpuTime - c0) / 1e9)
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    val standing = Multimodal.synthImages(spark,
        docs.select(col("doc_id")).filter(col("doc_id") % 3 =!= 1))
      .unionByName(Multimodal.synthTwinImages(spark, nPairs = 8, base = 3000000L))
    // the FIXED delta: same rows against every corpus (GenData texts and
    // ids are pure functions of doc_id, the q147 `fixed 5000` trick)
    val delta = Multimodal.synthImages(spark,
        docs.select(col("doc_id"))
          .filter(col("doc_id") % 5 === 2 && col("doc_id") % 3 =!= 0 &&
            col("doc_id") < cap)
          .select((col("doc_id") + 7000000L).as("doc_id")))
      .unionByName(Multimodal.synthTwinImages(spark, nPairs = 8,
        base = 3000000L, idOffset = 3000000L))
    val bk = Seq("b0", "b1", "b2", "b3")

    // FULL recompute: fingerprint the union, pair it, close components
    val (nFull, fullCpu) = cpu {
      val bands = Multimodal.aHashBands(spark, standing.unionByName(delta))
        .localCheckpoint(true)
      val near = Multimodal.imageNearDupPairs(bands, maxHamming = 3)
        .filter(col("id_a") =!= col("id_b")).select("id_a", "id_b")
      graft.dedup.Dedup.connectedComponents(near, "id_a", "id_b").count()
    }
    // INDEX build, once per standing corpus
    val (idx, buildCpu) = cpu {
      val i = Multimodal.aHashBands(spark, standing)
        .groupBy(bk.map(col): _*).agg(min(col("doc_id")).as("rep"))
        .localCheckpoint(true)
      i.count(); i
    }
    // PROBE: the incremental adjudication
    val (nKept, probeCpu) = cpu {
      MultimodalPipeline.deltaVerdicts(idx, Multimodal.aHashBands(spark, delta))
        .filter(col("kept")).count()
    }
    println(f"""{"probe":"multimodal_delta","dir":"$dir","cap":$cap,"full_cpu":$fullCpu%.1f,"build_cpu":$buildCpu%.1f,"probe_cpu":$probeCpu%.1f,"n_comp_reps":$nFull,"n_kept":$nKept}""")
    spark.stop()
  }
}
