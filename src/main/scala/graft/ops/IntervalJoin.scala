package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join — Spark plans a raw
  * `start <= ts AND ts <= end` theta join as a BroadcastNestedLoopJoin,
  * which is O(|points|·|intervals|) the moment the interval side outgrows
  * a broadcast. This is the bucketed formulation: time is cut into
  * fixed-width cells; each interval emits its O(len/width) overlapping
  * cells, each point exactly one, candidates form by (key, cell)
  * EQUI-join, and the exact containment predicate filters residually. A
  * point's cell is unique, so no pair duplicates and no dedup shuffle.
  * Total shuffle is linear: |points| + Σ cells(interval).
  *
  * `maxCells` guards the fan-out the way maxBucket guards LSH buckets: an
  * interval spanning more than maxCells cells is dropped from the join
  * (split such intervals upstream, or widen the cells);
  * [[oversizedIntervals]] is the audit view.
  */
object IntervalJoin {

  private def cell(ts: org.apache.spark.sql.Column, widthSec: Long) =
    // long/long divides as double in Spark; the quotient (epoch-micros /
    // cell width) stays far under 2^53, so floor is exact
    floor(unix_micros(ts) / lit(widthSec * 1000000L)).cast("long")

  /** Rows of `points` paired with every interval of the same key containing
    * their timestamp (inclusive bounds). Interval columns come through
    * as-is; name-collisions with point columns must be resolved upstream. */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
      tsCol: String, startCol: String, endCol: String,
      widthSec: Long = 3600L, maxCells: Int = 1024): DataFrame = {
    val ib = intervals
      .filter(cell(col(endCol), widthSec) - cell(col(startCol), widthSec) < maxCells)
      .withColumn("__cell",
        explode(sequence(cell(col(startCol), widthSec), cell(col(endCol), widthSec))))
    val pb = points.withColumn("__cell", cell(col(tsCol), widthSec))
    pb.join(ib, Seq(key, "__cell"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("__cell")
  }

  /** Intervals the join would drop at this (widthSec, maxCells) — split
    * them or widen the cells. */
  def oversizedIntervals(intervals: DataFrame, startCol: String, endCol: String,
      widthSec: Long = 3600L, maxCells: Int = 1024): DataFrame =
    intervals.filter(
      cell(col(endCol), widthSec) - cell(col(startCol), widthSec) >= maxCells)
}
