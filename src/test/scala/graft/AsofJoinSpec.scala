package graft

import java.sql.Timestamp

import graft.ops.AsofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000L)

  test("asofJoin: latest-at-or-before semantics, inclusive ties, null when none") {
    val left = Seq(
      (1L, ts(5), 10L),   // before any right row → null match
      (2L, ts(10), 10L),  // equal ts → inclusive match
      (3L, ts(25), 10L),  // between right rows → earlier one
      (4L, ts(40), 10L),  // after both → latest
      (5L, ts(40), 20L)   // other key, no right rows at all
    ).toDF("id", "t", "k")
    val right = Seq(
      (10L, ts(10), "a"),
      (10L, ts(30), "b")
    ).toDF("k", "t", "tag")
    val out = AsofJoin.asofJoin(left, right, "k", "t", payload = Seq("tag"))
      .select($"id", $"asof_tag").as[(Long, Option[String])]
      .collect().toMap
    assert(out == Map(
      1L -> None, 2L -> Some("a"), 3L -> Some("a"), 4L -> Some("b"), 5L -> None))
  }

  test("asofJoin preserves genuinely-null payload fields of the matched row") {
    val left = Seq((1L, ts(20), 10L)).toDF("id", "t", "k")
    val right = Seq(
      (10L, ts(5), Some("old")),
      (10L, ts(10), None: Option[String]) // latest row has a NULL field
    ).toDF("k", "t", "tag")
    val row = AsofJoin.asofJoin(left, right, "k", "t", payload = Seq("tag"))
      .select($"asof_tag", $"asof_t").head()
    // the struct-carried payload must NOT fall back to the older non-null
    assert(row.isNullAt(0) && row.getTimestamp(1) == ts(10))
  }
}
