package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming event-sequence pair extraction — q164's Markov-transition
  * input as a LIVE operator: per user, each arriving event pairs with
  * the user's PREVIOUS event, so the transition matrix downstream is a
  * plain streaming count (sums are batch-split-invariant — the q152
  * discipline; the stateful part is only the sequencing, which is
  * exactly what batch lead() cannot do on an unbounded stream).
  *
  * Input contract (loud, not silent): micro-batches arrive in event-time
  * order per user — within a batch rows sort by (ts_us, event_id); a
  * cross-batch regression (an event at or before the user's last seen
  * sequence position) raises, because a transition already emitted
  * cannot be retracted. This is the [[StreamingAnomaly]] contract: feed
  * it from a watermark-ordered upstream (or the test harness's
  * `EventsStream.replayOrdered` time-split batches).
  *
  * Scale shape: state per user is ONE (ts_us, event_id, type) triple —
  * bounded regardless of stream lifetime; output is one pair per event
  * after the user's first. Streamed pairs == batch lead() pairs row for
  * row, so the counts downstream equal q164 bit-for-bit (q168 proves it
  * against q164's oracle).
  */
object StreamingTransitions {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long, event_type: String)
  case class Pair(src: String, dst: String)
  case class LastEv(tsUs: Long, eventId: Long, tpe: String)

  def pairs(spark: SparkSession, stream: Dataset[Ev]): Dataset[Pair] = {
    import spark.implicits._
    stream.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[LastEv]) =>
          var last = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[Pair]()
          rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            last.foreach { l =>
              require(e.ts_us > l.tsUs ||
                  (e.ts_us == l.tsUs && e.event_id > l.eventId),
                s"StreamingTransitions: event ${e.event_id} for user $uid " +
                  s"arrived at or before the already-sequenced (${l.tsUs}, " +
                  s"${l.eventId}) — feed event-time-ordered micro-batches")
              out += Pair(l.tpe, e.event_type)
            }
            last = Some(LastEv(e.ts_us, e.event_id, e.event_type))
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
