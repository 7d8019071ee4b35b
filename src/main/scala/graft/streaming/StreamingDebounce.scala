package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming burst-collapse debounce — [[EventsOps.debounce]]'s islands
  * semantics as a LIVE filter: an event within `epsSec` of the chain's
  * previous event extends the current burst (and is dropped); a larger
  * gap starts a new burst (and the event is kept). Per-key state is ONE
  * chain-end timestamp forever — the islands construction is exactly
  * what makes the batch operator resample-stable, and here it is what
  * makes the state O(1) (the "since last KEPT" alternative would need
  * the same single value but emits a DIFFERENT, order-fragile answer).
  *
  * Input contract (loud): event-time-ordered micro-batches per
  * (user, type) — within a batch rows sort by (ts_us, event_id); a
  * cross-batch regression raises (a drop already decided cannot be
  * revisited). The [[StreamingTransitions]]/[[StreamingAnomaly]]
  * contract. Streamed kept-flags equal the batch operator's row for
  * row (q174 proves it against q166's oracle).
  */
object StreamingDebounce {

  case class Ev(user_id: Long, event_type: String, ts_us: Long, event_id: Long)
  case class Kept(user_id: Long, event_type: String, ts_us: Long,
      event_id: Long, kept: Boolean)
  case class ChainEnd(tsUs: Long, eventId: Long)

  def debounce(spark: SparkSession, stream: Dataset[Ev],
      epsSec: Long): Dataset[Kept] = {
    import spark.implicits._
    val epsUs = epsSec * 1000000L
    stream.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[Ev], state: GroupState[ChainEnd]) =>
          var last = state.getOption
          val out = scala.collection.mutable.ArrayBuffer[Kept]()
          rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
            last.foreach { l =>
              require(e.ts_us > l.tsUs ||
                  (e.ts_us == l.tsUs && e.event_id > l.eventId),
                s"StreamingDebounce: event ${e.event_id} for key $key arrived " +
                  s"at or before the already-chained (${l.tsUs}, ${l.eventId}) " +
                  "— feed event-time-ordered micro-batches")
            }
            val kept = last.forall(l => e.ts_us - l.tsUs > epsUs)
            out += Kept(e.user_id, e.event_type, e.ts_us, e.event_id, kept)
            last = Some(ChainEnd(e.ts_us, e.event_id))
          }
          last.foreach(state.update)
          out.iterator
      }
  }
}
