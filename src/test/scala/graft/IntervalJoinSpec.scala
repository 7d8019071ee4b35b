package graft

import java.sql.Timestamp

import graft.ops.IntervalJoin

class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("pointInInterval: containment incl. bounds, cell straddling, key isolation") {
    // interval spans minutes [50, 130] — straddles three 1-hour cells
    val intervals = Seq((10L, ts(50), ts(130), "w1"), (20L, ts(0), ts(10), "w2"))
      .toDF("k", "s", "e", "w")
    val points = Seq(
      (1L, 10L, ts(50)),   // at start bound → in
      (2L, 10L, ts(75)),   // middle cell → in
      (3L, 10L, ts(130)),  // at end bound → in
      (4L, 10L, ts(131)),  // past end, same cell as end → out (residual filter)
      (5L, 10L, ts(5)),    // before window → out
      (6L, 20L, ts(75))    // other key, outside its own window → out
    ).toDF("id", "k", "t")
    val got = IntervalJoin.pointInInterval(points, intervals, "k", "t", "s", "e")
      .select($"id", $"w").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "w1"), (2L, "w1"), (3L, "w1")))
    // exactly one output row per matching pair (no bucket-duplicate pairs)
    assert(IntervalJoin.pointInInterval(points, intervals, "k", "t", "s", "e").count() == 3)
  }

  test("oversized intervals are dropped from the join and audited") {
    val intervals = Seq((10L, ts(0), ts(60 * 5000L), "huge")).toDF("k", "s", "e", "w")
    val points = Seq((1L, 10L, ts(30))).toDF("id", "k", "t")
    assert(IntervalJoin.pointInInterval(points, intervals, "k", "t", "s", "e",
      widthSec = 3600L, maxCells = 16).count() == 0)
    assert(IntervalJoin.oversizedIntervals(intervals, "s", "e",
      widthSec = 3600L, maxCells = 16).count() == 1)
  }
}
