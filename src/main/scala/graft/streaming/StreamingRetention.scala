package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distinct (user, period) extraction — q178's retention
  * input as a LIVE operator: each arriving event's activity period is
  * emitted EXACTLY ONCE per user (first sight), so the cohort matrix
  * downstream is a plain rollup of the landed append stream.
  *
  * Unlike the sequencing operators ([[StreamingTransitions]],
  * [[StreamingDebounce]]) this needs NO ordering contract: "have I seen
  * this (user, period) before" is set membership — order-free and
  * batch-split-invariant by construction, so ARBITRARY shuffled replay
  * (the q131 discipline) must land the identical row set, and q183
  * proves it against q178's batch oracle.
  *
  * Scale shape: state per user is the set of ACTIVE periods — bounded
  * by the CALENDAR (at most periods-since-launch entries, the q178
  * bound), not by event volume; output is one row per (user, period),
  * emitted at first occurrence and never retracted. */
object StreamingRetention {

  case class UW(user_id: Long, w: Long)

  def newUserPeriods(spark: SparkSession, stream: Dataset[UW]): Dataset[UW] = {
    import spark.implicits._
    stream.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[UW], state: GroupState[Set[Long]]) =>
          val seen = state.getOption.getOrElse(Set.empty[Long])
          // sorted emission order for determinism within a batch (the
          // row SET is order-free; this only stabilizes file layout)
          val fresh = (rows.map(_.w).toSet -- seen).toSeq.sorted
          if (fresh.nonEmpty) state.update(seen ++ fresh)
          fresh.iterator.map(w => UW(uid, w))
      }
  }
}
