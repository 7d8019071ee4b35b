package graft.examples

import org.apache.spark.sql.functions._

/** Stage-cost probe for q228's streaming component maintenance: times
  * the replay materialization, landPartials (per-batch local closures
  * through the streaming engine) and mergedMap (the per-shard
  * deltaComponents fold) separately, on a pair load of the q228 class.
  *
  * Run: sbt "runMain graft.examples.StreamCcProbe"  (SPARK_GRAFT_SF_DIR)
  */
object StreamCcProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    docs.count()
    // a q228-class pair load: near-dup pairs over the corpus
    val pairs = graft.dedup.Dedup
      .minHashPairs(docs.unionByName(
        docs.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(col("text"), lit("  ")).as("text"))),
        "text", "doc_id", threshold = 0.7)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    println(s"[probe] pairs=${pairs.count()}")
    (1 to 2).foreach { rep =>
      println(s"[probe] --- repetition $rep ---")
      val stream = time("replay materialize")(
        graft.streaming.EventsStream.replayShuffled(pairs, nFiles = 4))
      val out = graft.Scratch.dir("graft_ccprobe").toString
      time("landPartials (stream)")(
        graft.streaming.StreamingComponents.landPartials(spark, stream, out))
      time("mergedMap fold + count")(
        graft.streaming.StreamingComponents.mergedMap(spark, out).count())
    }
    spark.stop()
  }
}
