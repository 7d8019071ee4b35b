package graft.examples

import org.apache.spark.sql.functions._

/** Two-axis probe behind q238's scale claim ("advance cost follows the
  * delta, not the corpus"): a FIXED delta advanced into standing LSH
  * indexes built over growing corpora. The advance touches the standing
  * side only through one broadcast-probed fps scan, so its cost should
  * stay near-flat while the index build (paid once per corpus) grows
  * with the data — the same shape DeltaProbe pins for the probe leg.
  *
  * Run: sbt "runMain graft.examples.AdvanceProbe /tmp/graft_sf0.1 /tmp/graft_sf1 /tmp/graft_sf3"
  */
object AdvanceProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/tmp/graft_sf0.1", "/tmp/graft_sf1", "/tmp/graft_sf3")
    val spark = graft.GraftSession()
    val osBean = java.lang.management.ManagementFactory
      .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    def timed(f: => Unit): (Double, Double) = {
      val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
      f
      ((System.nanoTime() - t0) / 1e9, (osBean.getProcessCpuTime - c0) / 1e9)
    }
    // the FIXED delta: the smallest corpus's q147-style increment, the
    // same rows against every standing index (GenData texts are pure
    // functions of doc_id, so this is corpus-independent by construction)
    val small = graft.sources.Tables.load(spark, dirs.head, "documents")
      .select(col("doc_id"), col("text"))
    val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
    val delta = small
      .filter(col("doc_id") % 13 === 0 && size(split(norm, " ")) >= 20)
      .select((col("doc_id") + 30000000L).as("doc_id"),
        concat(col("text"), lit(" fresh crawl revision tag")).as("text"))
      .unionByName(small.filter(col("doc_id") % 19 === 0)
        .select((col("doc_id") + 40000000L).as("doc_id"),
          concat(col("text"), lit("  ")).as("text")))
      .localCheckpoint(true)
    val nDelta = delta.count()
    dirs.foreach { dir =>
      val docs = graft.sources.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val n = docs.count()
      val path = graft.Scratch.dir("advprobe").toString
      val (bw, bc) = timed {
        graft.dedup.DeltaDedup.buildIndex(docs, "text", "doc_id", path)
      }
      val (aw, ac) = timed {
        graft.dedup.DeltaDedup.advanceIndex(spark, path, delta, "text", "doc_id")
      }
      println(f"[probe] corpus=$n%7d delta=$nDelta%5d  build=$bw%6.1f s/$bc%6.1f cpu  advance=$aw%6.2f s/$ac%6.2f cpu")
    }
    spark.stop()
  }
}
