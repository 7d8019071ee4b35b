package graft.examples

import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextAnalysis

/** Stage-cost probe behind the r15 `collapseExact` rework (the q28/q29
  * pre-banding collapse): times the corpus aggregation, the dup-group
  * join (shuffled vs broadcast), the signature/verify stages, the full
  * q28 pipeline, and a "slim" skeleton that fingerprints once and
  * fetches rep text by id join — the shape the rework adopted after
  * this probe showed `first(t)` dragging corpus text through the
  * aggregation exchange and the un-checkpointed multi-consumer
  * aggregate re-running per branch (q28 2.7 → 1.4 s warm at sf0.1).
  *
  * Run: sbt "runMain graft.examples.DedupCostProbe"  (SPARK_GRAFT_SF_DIR) */
object DedupCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val df = Tables.load(spark, dir, "documents")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    // warm
    df.count()
    val collapsed = df.groupBy(TextAnalysis.fingerprint(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("id"), first(col("text")).as("t"),
        count(lit(1)).as("n"))
    time("collapsed agg")(collapsed.count())
    time("collapsed agg again")(collapsed.count())
    val dups = df
      .select(col("doc_id").as("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .join(collapsed.filter(col("n") > 1).select(col("fp"), col("id").as("rep")), "fp")
      .select("id", "rep")
    time("dups join")(dups.count())
    val dupsB = df
      .select(col("doc_id").as("id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .join(broadcast(collapsed.filter(col("n") > 1).select(col("fp"), col("id").as("rep"))), "fp")
      .select("id", "rep")
    time("dups join broadcast")(dupsB.count())
    val reps = collapsed.select("id", "t")
    time("sig over reps")(reps.select(col("id"),
      graft.dedup.Dedup.minHashSignature(col("t"))).count())
    time("verify sets over reps")(graft.dedup.Dedup.hashedShingleSets(
      reps, "t", "id", 3, 2305843009213693951L).select(col("id")).count())
    time("q28 full")(graft.SparkEntry.queries("q28_dedup_minhash")(spark, dir).count())
    time("q28 full again")(graft.SparkEntry.queries("q28_dedup_minhash")(spark, dir).count())
    // slim variant: fingerprint ONCE (checkpointed slim), text fetched by
    // id join only for reps, dups derived without a second fingerprint pass
    def slimPairs(): Long = {
      val withFp = df.select(col("doc_id").as("id"),
        TextAnalysis.fingerprint(col("text")).as("fp")).localCheckpoint(true)
      val coll = withFp.groupBy("fp")
        .agg(min(col("id")).as("id"), count(lit(1)).as("n")).localCheckpoint(true)
      val reps = df.select(col("doc_id").as("id"), col("text").as("t"))
        .join(coll.select("id"), "id")
      val dups = withFp.join(coll.filter(col("n") > 1)
        .select(col("fp"), col("id").as("rep")), "fp").select("id", "rep")
      val sig = reps.select(col("id"), graft.dedup.Dedup.minHashSignature(col("t")).as("sig"))
      val buckets = sig.select(col("id"),
        explode(graft.dedup.Dedup.lshBands(col("sig"), 21, 3)).as("b"))
        .select(col("id"), col("b.band").as("band"), col("b.bkey").as("bkey"))
      val candidates = buckets.alias("x").join(buckets.alias("y"), Seq("band", "bkey"))
        .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
        .filter(col("id_a") < col("id_b"))
      val verifySets = graft.dedup.Dedup.hashedShingleSets(reps, "t", "id", 3,
        2305843009213693951L)
      val repPairs = graft.dedup.Dedup.verifyPairsJaccard(candidates, verifySets, 0.7)
        .dropDuplicates("id_a", "id_b")
      repPairs.count() + dups.count()
    }
    time("slim variant")(slimPairs())
    time("slim variant again")(slimPairs())
    spark.stop()
  }
}
