package graft.examples

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.streaming.OutputMode
import graft.GraftSession
import graft.streaming.{EventsOps, EventsStream}

/** Minimal end-to-end Structured Streaming example: a file-source event
  * stream (JSON drops landing in a directory) → watermarked tumbling-window
  * aggregation → memory sink, with a second drop arriving while the query
  * runs, then a cross-check against the batch operator on the same files.
  *
  * Run: sbt "runMain graft.examples.StreamDemo /tmp/evdrop"
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/evdrop")
    Files.createDirectories(Paths.get(dir))
    val spark = GraftSession("local[4]", 4)

    Files.write(Paths.get(s"$dir/a.json"),
      ("""{"event_id":1,"ts":"2024-01-01T00:05:00.000Z","user_id":1,"event_type":"click","value":1.0}""" + "\n" +
       """{"event_id":2,"ts":"2024-01-01T00:15:00.000Z","user_id":1,"event_type":"click","value":2.0}""" + "\n" +
       """{"event_id":3,"ts":"2024-01-01T01:10:00.000Z","user_id":2,"event_type":"view","value":5.0}""").getBytes)

    val stream = EventsStream.readEventStream(spark, dir, "json")
    val q = EventsStream.toMemorySink(
      EventsStream.windowedCounts(stream, "60 minutes", "120 minutes"),
      "wc", OutputMode.Update())
    q.processAllAvailable()
    println("AFTER-DROP1: " + spark.sql(
      "SELECT window.start, event_type, n, sum_value FROM wc ORDER BY 1, 2")
      .collect().mkString(" | "))

    // a new file lands while the query is live
    Files.write(Paths.get(s"$dir/b.json"),
      """{"event_id":4,"ts":"2024-01-01T00:45:00.000Z","user_id":3,"event_type":"click","value":10.0}""".getBytes)
    q.processAllAvailable()
    println("AFTER-DROP2: " + spark.sql(
      "SELECT window.start, event_type, n, sum_value FROM wc ORDER BY 1, 2")
      .collect().mkString(" | "))
    q.stop()

    val batch = spark.read.schema(EventsStream.eventSchema).json(dir)
    println("BATCH-EQUIV: " + EventsOps.windowedAgg(batch)
      .orderBy("hour", "event_type").collect().mkString(" | "))
    spark.stop()
  }
}
