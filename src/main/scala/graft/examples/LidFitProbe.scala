package graft.examples

import org.apache.spark.sql.functions._

/** A/B probe behind the lidFeatureStream normalize-once rule (r15): an
  * expression referenced inside a higher-order-function lambda
  * re-evaluates PER ELEMENT, so trigram generation that inlines
  * `normalize(text)` into the lambda runs the normalize regex once per
  * trigram — measured 12.6 single-core seconds per sf0.1 corpus vs ~2.8
  * with normalize in its own projection (and ~0.5 at scan parallelism).
  * The q232 micro-batches run the fit on ONE task (one replay file per
  * trigger), so the per-element cost is not hidden by scan splits the
  * way q229's batch fit hides it — this probe times the fit at three
  * partition shapes plus the streamed landing.
  *
  * Run: sbt "runMain graft.examples.LidFitProbe [sfDir]"
  */
object LidFitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession("local[16]", 16)
    import spark.implicits._
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select($"doc_id", $"lang", concat($"text", lit(" marker words here")).as("page"))
      .filter($"doc_id" % 3 =!= 0)
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("batch fit (scan splits)") {
      graft.ops.TrainingPrep.langidSeedCounts(docs, "page", "lang").count()
    }
    val four = docs.repartition(4).localCheckpoint(true)
    time("fit on 4 partitions") {
      graft.ops.TrainingPrep.langidSeedCounts(four, "page", "lang").count()
    }
    val one = docs.coalesce(1).localCheckpoint(true)
    time("fit on 1 partition") {
      graft.ops.TrainingPrep.langidSeedCounts(one, "page", "lang").count()
    }
    val stream = graft.streaming.EventsStream.replayShuffled(docs, nFiles = 4)
    val out = graft.Scratch.dir("lidprobe").toString
    time("landCounts 4 micro-batches") {
      graft.streaming.StreamingLangid.landCounts(spark, stream, "page", "lang", out)
    }
    spark.stop()
  }
}
