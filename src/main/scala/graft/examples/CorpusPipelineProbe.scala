package graft.examples

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextAnalysis
import graft.ops.TrainingPrep

/** Stage-cost probe for CorpusPipeline.prepare (q125) — times each stage
  * of the q125 composition at the bench corpus so the r15 optimization
  * round attacks the measured hot stage, not a guessed one.
  *
  * Run: sbt "runMain graft.examples.CorpusPipelineProbe"  (SPARK_GRAFT_SF_DIR)
  */
object CorpusPipelineProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    docs.count()
    (1 to 2).foreach { rep =>
      println(s"[probe] --- repetition $rep ---")
      // the q125 corpus construction, verbatim
      val exactDups = docs.filter($"doc_id" % 7 === 0)
        .select(($"doc_id" + 1000000).as("doc_id"), concat($"text", lit("  ")).as("text"))
      val nearDups = docs.filter($"doc_id" % 17 === 0)
        .select(($"doc_id" + 1200000).as("doc_id"),
          concat($"text", lit(" near duplicate copy tag")).as("text"))
      val carriers = docs.filter($"doc_id" % 13 === 0)
        .select(($"doc_id" + 1400000).as("doc_id"),
          concat(lit("Shared Wisdom Portal | Best Deals Daily "), $"text").as("text"))
      val corpus = docs.unionByName(exactDups).unionByName(nearDups).unionByName(carriers)
      val benchmark = docs.filter($"doc_id" % 97 === 0)

      // both dedup shapes, switched by arg: "oldshape" = the min_by
      // aggregate (corpus text through the fp exchange, re-aggregated
      // per cleanDocs consumer); default = the r15 collapseExact shape
      // (slim fp checkpoint + min(id) + text fetched by id join,
      // rep snapshot checkpointed)
      val deduped =
        if (args.contains("oldshape"))
          corpus.groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
            .agg(min(col("doc_id")).as("doc_id"),
              min_by(col("text"), col("doc_id")).as("text"))
            .drop("fp")
        else {
          val withFp = corpus.select(col("doc_id"),
            TextAnalysis.fingerprint(col("text")).as("fp")).localCheckpoint(true)
          val repIds = withFp.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
            .select(col("doc_id"))
          corpus.join(repIds, Seq("doc_id")).select(col("doc_id"), col("text"))
            .localCheckpoint(true)
        }
      val depassaged0 = graft.dedup.Boilerplate.cleanDocs(
        deduped, "text", "doc_id", k = 8, minDocs = 4)
      val depassaged = time("exact dedup + passage ckpt")(depassaged0.localCheckpoint(true))
      val quality = depassaged.filter(
        TextAnalysis.nChars(col("text")) >= 50 &&
          TextAnalysis.alphaRatio(col("text")) >= 0.5 &&
          graft.ops.TrainingPrep.repetitionScore(col("text")) <= 0.5)
      val clean = time("gates + decontaminate ckpt")(
        TrainingPrep.decontaminate(quality, "text", "doc_id", benchmark, "text")
          .localCheckpoint(true))
      val pairs = time("minhash pairs")(
        graft.dedup.Dedup.minHashPairs(clean, "text", "doc_id", threshold = 0.7)
          .select($"id_a", $"id_b").localCheckpoint(true))
      val clusters = time("components")(
        graft.dedup.Dedup.connectedComponents(pairs, "id_a", "id_b")
          .localCheckpoint(true))
      val dupIds = clusters.filter($"id" =!= $"cluster_id").select($"id".as("doc_id"))
      val unique = clean.join(dupIds, Seq("doc_id"), "left_anti")
      time("pack + count")(
        TrainingPrep.packSequences(unique, "text", "doc_id", 512, 8).count())
    }
    spark.stop()
  }
}
