package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming trailing-window anomaly screen — [[graft.ops.Trend]]'s
  * batch z-test ((w·y − S)² > z²·(w·Q − S²), the all-integer form) as a
  * LIVE monitor: per-key state is a deque of the last `window` finalized
  * points, so a spike is flagged the micro-batch its day closes, not in
  * tomorrow's batch job.
  *
  * Input contract (loud, not silent): the stream carries FINALIZED
  * per-(key, day) aggregates arriving in event-time order per key —
  * exactly what an upstream watermark-closed daily aggregation emits.
  * Within a micro-batch rows sort by day; across batches a
  * regressing or duplicate day raises (a trailing window cannot
  * retro-score the past).
  *
  * Scale shape: state per key is ≤ `window` (day, value) pairs —
  * bounded regardless of stream lifetime (the [[StreamingDedup]]/
  * sessionizer discipline); arithmetic is BigInt, the in-JVM mirror of
  * the batch operator's decimal(38,0) contract, so streamed flags equal
  * the batch flags bit-for-bit on any series the batch contract admits
  * (q139 proves it against the q121 oracle).
  */
object StreamingAnomaly {

  case class Point(grp: String, d: Long, n: Long)
  case class Flagged(grp: String, d: Long, n: Long, n_win: Long, flag: Boolean)
  case class WinState(points: Seq[(Long, Long)])

  def flags(spark: SparkSession, stream: Dataset[Point], window: Int,
      z2: Int = 4): Dataset[Flagged] = {
    require(window >= 1, "window must be >= 1")
    import spark.implicits._
    stream.groupByKey(_.grp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[Point], state: GroupState[WinState]) =>
          var pts = state.getOption.map(_.points.toList).getOrElse(Nil)
          val out = scala.collection.mutable.ArrayBuffer[Flagged]()
          rows.toSeq.sortBy(_.d).foreach { p =>
            require(pts.isEmpty || p.d > pts.last._1,
              s"StreamingAnomaly: day ${p.d} for key '$grp' arrived at or " +
                s"before already-finalized day ${pts.last._1} — the input " +
                "contract is finalized per-day aggregates in event-time order")
            pts = (pts :+ (p.d -> p.n))
              .dropWhile(_._1 < p.d - (window - 1))
            val w = BigInt(pts.size)
            val s = pts.iterator.map(x => BigInt(x._2)).sum
            val q = pts.iterator.map(x => BigInt(x._2) * x._2).sum
            val dev = w * p.n - s
            out += Flagged(grp, p.d, p.n, pts.size.toLong,
              dev * dev > BigInt(z2) * (w * q - s * s))
          }
          state.update(WinState(pts))
          out.iterator
      }
  }
}
