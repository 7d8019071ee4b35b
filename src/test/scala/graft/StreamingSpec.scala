package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{Event, EventsStream, SessionAgg}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  test("windowedCounts aggregates a micro-batch stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.toMemorySink(
      EventsStream.windowedCounts(mem.toDF(), "60 minutes", "120 minutes"),
      "wc", OutputMode.Update())
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(70), 2, "view", 5.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT event_type, n, sum_value FROM wc ORDER BY event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    assert(out.toSeq == Seq(("click", 2L, 3.0), ("view", 1L, 5.0)))
  }

  test("sessionizeStream opens sessions across gap boundaries and batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.toMemorySink(
      EventsStream.sessionizeStream(spark, mem.toDS(), gapSec = 1800).toDF(),
      "sess", OutputMode.Update())
    // user 1: two events 10 min apart (1 session), then one 40 min later (2nd)
    mem.addData(Event(1, ts(0), 1, "a", 0), Event(2, ts(10), 1, "a", 0))
    q.processAllAvailable()
    mem.addData(Event(3, ts(51), 1, "a", 0))
    q.processAllAvailable()
    val out = spark.sql("SELECT n_sessions, n_events FROM sess WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    q.stop()
    assert(out.contains((2L, 3L))) // latest update row has both sessions
  }

  test("sessionizeStreamExact heals a cross-batch late event the O(1) variant splits") {
    implicit val sqlCtx = spark.sqlContext
    // user 1 at minutes 0 and 60 (gap 30min ⇒ looks like 2 sessions),
    // then minute 30 arrives LATE in the next batch and bridges them:
    // batch semantics = ONE session of 3 events.
    def run(mk: MemoryStream[Event] => org.apache.spark.sql.Dataset[SessionAgg],
        name: String): (Long, Long) = {
      val mem = MemoryStream[Event]
      val q = EventsStream.toMemorySink(mk(mem).toDF(), name, OutputMode.Update())
      mem.addData(Event(1, ts(0), 1, "a", 0), Event(2, ts(60), 1, "a", 0))
      q.processAllAvailable()
      mem.addData(Event(3, ts(30), 1, "a", 0))
      q.processAllAvailable()
      val r = spark.sql(s"SELECT n_sessions, n_events FROM $name WHERE user_id = 1")
        .collect().map(x => (x.getLong(0), x.getLong(1))).last
      q.stop(); r
    }
    val exact = run(m => EventsStream.sessionizeStreamExact(spark, m.toDS(), 1800), "sx")
    val plain = run(m => EventsStream.sessionizeStream(spark, m.toDS(), 1800), "sp")
    assert(exact == ((1L, 3L)), s"exact variant must match batch, got $exact")
    assert(plain == ((2L, 3L)), s"O(1) variant documented to overcount, got $plain")
    // and the batch operator agrees with the exact variant
    val batch = graft.streaming.EventsOps.sessionize(
      Seq((1L, ts(0)), (1L, ts(60)), (1L, ts(30))).toDF("user_id", "ts"), 1800)
    assert(batch.select("session_id").distinct().count() == 1L)
  }

  test("sessionizeStreamEvicting finalizes and drops idle users past the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventsStream.toMemorySink(
      EventsStream.sessionizeStreamEvicting(spark, mem.toDS(), gapSec = 1800,
        watermarkDelay = "10 minutes", idleEvictSec = 3600).toDF(),
      "sev", OutputMode.Update())
    // user 1: two events 10 min apart = one session (timestamps start
    // past zero: the stateful operator's late-row filter drops rows not
    // strictly above the watermark, and the initial watermark is 0)
    mem.addData(Event(1, ts(100), 1, "a", 0), Event(2, ts(110), 1, "a", 0))
    q.processAllAvailable()
    // user 2 far in the future advances the watermark beyond user 1's
    // idle horizon (110min + 60min); the NEXT batch fires user 1's timeout
    mem.addData(Event(3, ts(600), 2, "a", 0))
    q.processAllAvailable()
    mem.addData(Event(4, ts(610), 2, "a", 0))
    q.processAllAvailable()
    val u1 = spark.sql("SELECT n_sessions, n_events FROM sev WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(u1.last == ((1L, 2L)), s"timeout must emit the finalized aggregate, got $u1")
    // eviction is real: a post-eviction event restarts from a FRESH state
    // (1 session, 1 event) instead of continuing the old counters
    mem.addData(Event(5, ts(620), 1, "a", 0))
    q.processAllAvailable()
    val again = spark.sql("SELECT n_sessions, n_events FROM sev WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    q.stop()
    assert(again.last == ((1L, 1L)), s"state must be dropped on eviction, got $again")
  }

  test("StreamingDedup keeps first arrival per fingerprint; Ivf.appendToIndex extends a built index") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Timestamp)]
    val df = mem.toDF().toDF("doc_id", "text", "ts")
    val q = EventsStream.toMemorySink(
      graft.streaming.StreamingDedup.dedupStream(df, "text", "ts", "10 minutes"),
      "sdd", OutputMode.Append())
    mem.addData((1L, "hello world", ts(100)), (2L, "HELLO  world ", ts(101)),
      (3L, "different text", ts(102)))
    q.processAllAvailable()
    mem.addData((4L, "hello world", ts(103))) // dup within horizon — dropped
    q.processAllAvailable()
    // advance watermark far past the horizon, then the fp is forgotten
    mem.addData((5L, "way later", ts(500)))
    q.processAllAvailable()
    mem.addData((6L, "hello world", ts(501))) // past horizon — admitted again
    q.processAllAvailable()
    val ids = spark.sql("SELECT doc_id FROM sdd").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(ids.intersect(Set(1L, 2L)).size == 1, s"one of the first-batch dups survives, got $ids")
    assert(!ids.contains(4L) && ids.contains(3L) && ids.contains(5L))
    assert(ids.contains(6L), "expired fingerprint must be admitted again (bounded state)")

    // appendToIndex: new planted neighbor lands in the query's cell and wins
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = sources.Tables.load(spark, sfDir, "embeddings").select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_append").toString
    graft.similarity.Ivf.buildIndex(emb, "embedding", "vec_id", dim = 64, nCells = 8, path = path)
    val qs = emb.filter($"vec_id" === 1)
    val newcomer = qs.select(($"vec_id" + 5000000).as("vec_id"),
      transform($"embedding", x => (x * lit(8.0f)).cast("float")).as("embedding"))
    graft.similarity.Ivf.appendToIndex(newcomer, "embedding", "vec_id", path)
    val top = graft.similarity.Ivf.probeTopK(spark, path, qs, "embedding", "vec_id",
      k = 1, nProbe = 1).select("n_id").as[Long].head()
    assert(top == 5000001L, s"appended direction-identical vector must rank first, got $top")
  }

  test("ingest composition: stream → dedup → appendToIndex makes novel vectors probeable, drops dups") {
    // The "daily ingest" story end-to-end: documents+embeddings arrive as a
    // micro-batch stream, exact-dedup runs BEFORE landing, and each deduped
    // batch is appended to the prebuilt IVF index via dynamic-partition
    // append — so a late near-dup never pollutes the index and a novel
    // vector is probeable as soon as its batch commits.
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = sources.Tables.load(spark, sfDir, "embeddings").select($"vec_id", $"embedding")
    val path = java.nio.file.Files.createTempDirectory("ivf_ingest").toString
    graft.similarity.Ivf.buildIndex(emb, "embedding", "vec_id", dim = 64, nCells = 8, path = path)

    // newcomer embedding: 8x the query vector — direction-identical (float-
    // exact scaling), so same cell and cosine exactly 1.0 ⇒ must rank first
    val qs = emb.filter($"vec_id" === 2)
    val novelVec = qs.select(transform($"embedding", x => (x * lit(8.0f)).cast("float")))
      .as[Array[Float]].head()

    val mem = MemoryStream[(Long, String, Timestamp, Array[Float])]
    val deduped = graft.streaming.StreamingDedup.dedupStream(
      mem.toDF().toDF("doc_id", "text", "ts", "embedding"), "text", "ts", "10 minutes")
    val q = deduped.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val vecs = batch.select($"doc_id".as("vec_id"), $"embedding")
        if (!vecs.isEmpty)
          graft.similarity.Ivf.appendToIndex(vecs, "embedding", "vec_id", path)
      }.start()
    try {
      mem.addData((9000001L, "novel ingest doc", ts(100), novelVec))
      q.processAllAvailable()
      // later batch, same normalized text, different vector: dedup drops it
      mem.addData((9000002L, "  NOVEL ingest  doc", ts(101), novelVec.map(-_)))
      q.processAllAvailable()
    } finally q.stop()

    val top = graft.similarity.Ivf.probeTopK(spark, path, qs, "embedding", "vec_id",
      k = 1, nProbe = 1).select("n_id").as[Long].head()
    assert(top == 9000001L, s"ingested novel vector must be probeable and rank first, got $top")
    val polluted = spark.read.parquet(s"$path/data")
      .filter($"n_id" === 9000002L).count()
    assert(polluted == 0, "deduped doc's vector must never reach the index")
  }

  test("streaming windowedCounts matches the batch EventsOps on same data") {
    val events = sources.Tables.load(spark, sfDir, "events")
    val batch = graft.streaming.EventsOps.windowedAgg(events).count()
    assert(batch > 0)
  }

  // stream-stream join tests place events well past epoch 0: the initial
  // watermark is 0, and a row AT the watermark is treated as late and
  // dropped from join state — an artifact of epoch-0 test data, not of the
  // operator.
  private def ts6(min: Long): Timestamp = new Timestamp((min + 1000000L) * 60000L)

  test("streamIntervalJoin pairs in-horizon rows across batches, excludes out-of-range") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = EventsStream.streamIntervalJoin(
      clicks.toDF().selectExpr("event_id AS click_id", "user_id AS c_user", "ts AS click_ts"),
      purchases.toDF().selectExpr("event_id AS p_id", "user_id AS p_user", "ts AS p_ts", "value"),
      "c_user", "p_user", "click_ts", "p_ts",
      horizon = "60 minutes", watermark = "120 minutes")
    val q = EventsStream.toMemorySink(joined, "ssj", OutputMode.Append())
    // user 1 clicks at t0; purchase at t30 (in horizon), at t90 (out).
    // user 2 purchase at t10 with no click — inner join drops it.
    clicks.addData(Event(1, ts6(0), 1, "click", 0))
    purchases.addData(Event(10, ts6(30), 1, "purchase", 5.0))
    q.processAllAvailable()
    // second batch: the purchase side arrives AFTER the click was buffered
    purchases.addData(Event(11, ts6(90), 1, "purchase", 7.0),
      Event(12, ts6(10), 2, "purchase", 9.0))
    q.processAllAvailable()
    val out = spark.sql("SELECT click_id, p_id, value FROM ssj ORDER BY p_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    assert(out.toSeq == Seq((1L, 10L, 5.0)))
  }

  test("streamIntervalJoin leftOuter emits unmatched rows once the watermark proves no partner") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val joined = EventsStream.streamIntervalJoin(
      clicks.toDF().selectExpr("event_id AS click_id", "user_id AS c_user", "ts AS click_ts"),
      purchases.toDF().selectExpr("event_id AS p_id", "user_id AS p_user", "ts AS p_ts"),
      "c_user", "p_user", "click_ts", "p_ts",
      horizon = "60 minutes", watermark = "30 minutes", joinType = "leftOuter")
    val q = EventsStream.toMemorySink(joined, "ssjo", OutputMode.Append())
    // user 1 clicks and converts; user 2 clicks and never converts
    clicks.addData(Event(1, ts6(0), 1, "click", 0), Event(2, ts6(0), 2, "click", 0))
    purchases.addData(Event(10, ts6(30), 1, "purchase", 5.0))
    q.processAllAvailable()
    // advance BOTH watermarks far past click+horizon+lateness so the
    // engine can prove user 2's click will never find a partner
    clicks.addData(Event(3, ts6(600), 3, "click", 0))
    purchases.addData(Event(11, ts6(600), 3, "purchase", 1.0))
    q.processAllAvailable()
    val rows = spark.sql("SELECT click_id, p_id FROM ssjo").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    q.stop()
    assert(rows.contains((1L, 10L)), s"matched pair must emit, got $rows")
    assert(rows.contains((2L, -1L)),
      s"unmatched click must emit with null partner after the watermark passes, got $rows")
  }

  test("streamIntervalJoin matches the batch interval join on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val cRows = Seq(Event(1, ts6(0), 1, "click", 0), Event(2, ts6(45), 1, "click", 0),
      Event(3, ts6(20), 2, "click", 0))
    val pRows = Seq(Event(10, ts6(30), 1, "purchase", 5.0),
      Event(11, ts6(100), 1, "purchase", 7.0), Event(12, ts6(25), 2, "purchase", 9.0))
    val joined = EventsStream.streamIntervalJoin(
      clicks.toDF().selectExpr("event_id AS click_id", "user_id AS c_user", "ts AS click_ts"),
      purchases.toDF().selectExpr("event_id AS p_id", "user_id AS p_user", "ts AS p_ts"),
      "c_user", "p_user", "click_ts", "p_ts",
      horizon = "60 minutes", watermark = "240 minutes")
    val q = EventsStream.toMemorySink(joined, "ssj2", OutputMode.Append())
    clicks.addData(cRows: _*); purchases.addData(pRows: _*)
    q.processAllAvailable()
    val stream = spark.sql("SELECT click_id, p_id FROM ssj2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    val batch = cRows.toDF().selectExpr("event_id AS click_id", "user_id AS c_user", "ts AS click_ts")
      .join(pRows.toDF().selectExpr("event_id AS p_id", "user_id AS p_user", "ts AS p_ts"),
        org.apache.spark.sql.functions.expr(
          "c_user = p_user AND p_ts >= click_ts AND p_ts <= click_ts + INTERVAL 60 minutes"))
      .select("click_id", "p_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stream == batch && batch.nonEmpty)
  }

  test("TrendingTokens: windows finalize on watermark, top-k ranking matches hand count") {
    import graft.streaming.TrendingTokens
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val counts = TrendingTokens.tokenCountsStream(
      mem.toDF().toDF("ts", "text"), "text", "ts",
      windowLen = "10 minutes", delay = "5 minutes")
    val q = EventsStream.toMemorySink(counts, "trend", OutputMode.Append())
    // window [0,10): "spam" dominates; window [10,20): "fox" does
    mem.addData(
      (ts(1), "spam spam spam fox"), (ts(2), "spam dog"),
      (ts(11), "fox fox dog"), (ts(12), "fox cat"))
    q.processAllAvailable()
    // advance the watermark far enough to close both windows
    mem.addData((ts(40), "later marker"))
    q.processAllAvailable()
    val landed = spark.sql("SELECT window, tok, n FROM trend")
    val top = TrendingTokens.topTokens(landed, k = 2)
      .selectExpr("CAST(window.start AS LONG) AS w", "rk", "tok", "n")
      .collect().map(r => (r.getLong(0) / 60, r.getInt(1), r.getString(2), r.getLong(3)))
    q.stop()
    val w1 = top.filter(_._1 == 0).sortBy(_._2)
    val w2 = top.filter(_._1 == 10).sortBy(_._2)
    assert(w1.head._3 == "spam" && w1.head._4 == 4L, w1.mkString(","))
    assert(w2.head._3 == "fox" && w2.head._4 == 3L, w2.mkString(","))
    assert(w1.length == 2 && w2.length == 2)
  }

  test("StreamMerge upsert sink: latest-per-key table, idempotent under batch replay") {
    import graft.streaming.StreamMerge
    val dir = java.nio.file.Files.createTempDirectory("smerge").toString + "/table"
    def table() = spark.read.parquet(dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

    // batch 1: two fresh keys
    StreamMerge.applyBatch(
      Seq((1L, "a", 10L), (2L, "b", 10L)).toDF("k", "v", "ts"), "k", "ts", dir)
    assert(table() == Set((1L, "a", 10L), (2L, "b", 10L)))

    // batch 2: update k1 (latest of two in-batch rows wins), insert k3
    val b2 = Seq((1L, "stale", 11L), (1L, "fresh", 12L), (3L, "c", 11L))
      .toDF("k", "v", "ts")
    StreamMerge.applyBatch(b2, "k", "ts", dir)
    val after2 = table()
    assert(after2 == Set((1L, "fresh", 12L), (2L, "b", 10L), (3L, "c", 11L)))

    // replay of the same batch (the foreachBatch failure contract) is a no-op
    StreamMerge.applyBatch(b2, "k", "ts", dir)
    assert(table() == after2)

    // end-to-end through a real streaming query
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    mem.addData((2L, "b2", 20L), (4L, "d", 20L))
    val ckpt = java.nio.file.Files.createTempDirectory("smergeck").toString
    val q = StreamMerge.upsertSink(mem.toDF().toDF("k", "v", "ts"), "k", "ts", dir, ckpt)
    q.awaitTermination(60000)
    assert(table() == Set((1L, "fresh", 12L), (2L, "b2", 20L), (3L, "c", 11L), (4L, "d", 20L)))
  }

  test("StreamingAnomaly equals the batch flags across batch splits; regressing day raises") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.{EventsStream, StreamingAnomaly}
    // two keys, 20 days, a planted x5 spike on day 12 of key a
    val daily = (0L until 20L).flatMap { d =>
      Seq(("a", d, if (d == 12) 150L else 30L + d % 4),
        ("b", d, 40L + (d * 7) % 11))
    }.toDF("grp", "d", "n")
    val batch = graft.ops.Trend.anomalyFlags(daily, "grp", "d", "n", window = 7)
      .select($"grp", $"d", $"n", $"n_win", $"flag")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    // streamed across an adversarial split: the spike's window spans it
    val stream = EventsStream.replayOrdered(Seq(
      daily.filter($"d" < 11), daily.filter($"d" >= 11 && $"d" < 14),
      daily.filter($"d" >= 14)))
    val flagged = StreamingAnomaly.flags(spark,
      stream.as[StreamingAnomaly.Point], window = 7)
    spark.catalog.dropTempView("sa_sink")
    val q = EventsStream.toMemorySink(flagged.toDF(), "sa_sink",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sa_sink")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(streamed == batch, "streamed flags must equal the batch operator's")
    assert(streamed.exists { case (g, d, _, _, f) => g == "a" && d == 12 && f },
      "the planted spike must be flagged")
    // the input contract is loud: a day at-or-before a finalized one raises
    val bad = EventsStream.replayOrdered(Seq(
      daily.filter($"d" >= 10 && $"d" < 12), daily.filter($"d" < 2)))
    val badQ = EventsStream.toMemorySink(
      StreamingAnomaly.flags(spark, bad.as[StreamingAnomaly.Point], 7).toDF(),
      "sa_bad", org.apache.spark.sql.streaming.OutputMode.Append())
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      badQ.processAllAvailable()
    }
    badQ.stop()
    assert(e.getMessage != null, "regressing day must fail the stream")
  }

  test("StreamingTransitions: streamed pairs equal batch lead() across splits; regression raises") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.{EventsStream, StreamingTransitions}
    // two users, interleaved types; event ids double as micros-timestamps
    val ev = Seq(
      (1L, 10L, 100L, "view"), (1L, 20L, 101L, "click"), (1L, 30L, 102L, "buy"),
      (1L, 30L, 103L, "view"),                   // ts tie broken by event_id
      (2L, 5L, 200L, "view"), (2L, 40L, 201L, "view")
    ).toDF("user_id", "ts_us", "event_id", "event_type")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    val batch = ev.select($"event_type".as("src"),
        lead($"event_type", 1).over(w).as("dst"))
      .filter($"dst".isNotNull)
      .groupBy($"src", $"dst").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // split so user 1's sequence spans the batch boundary mid-stream
    val stream = EventsStream.replayOrdered(Seq(
      ev.filter($"ts_us" < 25), ev.filter($"ts_us" >= 25)))
    val pairs = StreamingTransitions.pairs(spark, stream.as[StreamingTransitions.Ev])
    spark.catalog.dropTempView("st_sink")
    val q = EventsStream.toMemorySink(pairs.toDF(), "st_sink",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("st_sink").groupBy($"src", $"dst").count()
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    // cross-batch regression (an event before the sequenced position) raises
    val bad = EventsStream.replayOrdered(Seq(
      ev.filter($"ts_us" >= 25), ev.filter($"ts_us" < 25)))
    val badQ = EventsStream.toMemorySink(
      StreamingTransitions.pairs(spark, bad.as[StreamingTransitions.Ev]).toDF(),
      "st_bad", org.apache.spark.sql.streaming.OutputMode.Append())
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      badQ.processAllAvailable()
    }
    badQ.stop()
    assert(e.getMessage != null, "out-of-order batch must fail the stream")
  }

  test("StreamingDebounce: kept-flags equal the batch islands across a mid-burst split") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.{EventsStream, StreamingDebounce}
    // one key; bursts [0,5,9] (chain of ≤5-gaps), [30], [36] (gap 6 > eps=5)
    val us = Seq(0L, 5L, 9L, 30L, 36L)
    val ev = us.zipWithIndex
      .map { case (t, i) => (1L, "c", t * 1000000L, 100L + i) }
      .toDF("user_id", "event_type", "ts_us", "event_id")
    val batchKept = graft.streaming.EventsOps
      .debounce(ev.select($"user_id", $"event_type",
        timestamp_micros($"ts_us").as("ts"), $"event_id"), epsSec = 5L)
      .select($"event_id", $"kept")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    // split MID-BURST: the 9s event arrives a batch after its 5s chain-end
    val stream = EventsStream.replayOrdered(Seq(
      ev.filter($"ts_us" <= 5000000L), ev.filter($"ts_us" > 5000000L)))
    val kept = StreamingDebounce.debounce(spark,
      stream.as[StreamingDebounce.Ev], epsSec = 5L)
    spark.catalog.dropTempView("sd_sink")
    val q = EventsStream.toMemorySink(kept.toDF(), "sd_sink",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sd_sink").select($"event_id", $"kept")
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSet
    assert(streamed == batchKept, s"streamed=$streamed batch=$batchKept")
    // the mid-burst chain decision: 9s is DROPPED (4s gap) even though
    // its chain-end lived in the previous micro-batch
    assert(streamed.contains((102L, false)) && streamed.contains((103L, true)))
  }

  test("StreamingRetention: first-sight emission exactly once across a mid-period split") {
    import spark.implicits._
    import graft.streaming.{EventsStream, StreamingRetention}
    // user 1 active in periods 0 (twice, split across batches) and 2;
    // user 2 only in period 0 — re-arrivals of a seen period emit nothing
    val b1 = Seq((1L, 0L), (2L, 0L)).toDF("user_id", "w")
    val b2 = Seq((1L, 0L), (1L, 2L), (2L, 0L)).toDF("user_id", "w")
    val stream = EventsStream.replayOrdered(Seq(b1, b2))
    val uw = StreamingRetention.newUserPeriods(spark,
      stream.as[StreamingRetention.UW])
    spark.catalog.dropTempView("sr_sink")
    val q = EventsStream.toMemorySink(uw.toDF(), "sr_sink",
      org.apache.spark.sql.streaming.OutputMode.Append())
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("sr_sink")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // EXACTLY once per (user, period) — a bag, not a set, so a double
    // emission would fail here even though the set looks right
    assert(rows.sorted == Seq((1L, 0L), (1L, 2L), (2L, 0L)),
      rows.mkString(";"))
  }

  test("StreamingMmIndex: landed chain merges to the from-scratch index; verdicts final at arrival") {
    import graft.multimodal.{Multimodal, MultimodalPipeline}
    import graft.streaming.StreamingMmIndex
    import org.apache.spark.sql.functions.{col, min}
    val bk = Seq("b0", "b1", "b2", "b3")
    def bands(a: org.apache.spark.sql.DataFrame) =
      Multimodal.audioFingerprintBands(spark, a)
    // standing = even halves of 3 twin pairs; two ordered ingest slices:
    // the odd twins (all attach -> dropped), then 3 fresh organics (kept)
    val twins = Multimodal.synthTwinAudio(spark, nPairs = 3, base = 500L)
    val standingAssets = twins.filter(col("doc_id") % 2 === 0)
    val idx0 = bands(standingAssets).groupBy(bk.map(col): _*)
      .agg(min(col("doc_id")).as("rep"))
    val b1 = twins.filter(col("doc_id") % 2 === 1)
    val b2 = Multimodal.synthNoiseAudio(spark,
      spark.range(900L, 903L).toDF("doc_id"))
    val out = graft.Scratch.dir("graft_smi_test").toString
    val (vDir, iDir) = StreamingMmIndex.drain(spark, idx0,
      graft.streaming.EventsStream.replayOrdered(Seq(b1, b2)),
      bands, out)
    val verdicts = spark.read.parquet(vDir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("kept"))).toMap
    val want = Seq(501L -> false, 503L -> false, 505L -> false,
      900L -> true, 901L -> true, 902L -> true).toMap
    assert(verdicts == want, verdicts.toString)
    // the min-merged landed chain IS the from-scratch union index — no
    // drift however the ingest was batched
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) -> r.getLong(4)).toMap
    val merged = StreamingMmIndex.indexAsOf(spark, iDir, Long.MaxValue)
    val batch = MultimodalPipeline.advanceIndex(idx0.limit(0),
      bands(standingAssets.unionByName(b1).unionByName(b2)))
    assert(asMap(merged) == asMap(batch), "landed chain drifted from batch index")
    // re-running a batch against its predecessor set reproduces its landed
    // verdicts byte-for-byte (the at-least-once retry path): batch 1's
    // verdicts recomputed from indexAsOf(1) == the landed shard=1
    val landed1 = spark.read.parquet(vDir).filter(col("shard") === 1)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("kept"))).toMap
    val recomputed = MultimodalPipeline.deltaVerdicts(
        StreamingMmIndex.indexAsOf(spark, iDir, 1L), bands(b2))
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(landed1 == recomputed && landed1.nonEmpty, s"$landed1 vs $recomputed")
  }

  test("StreamingFrontier: emit once at first sighting; visited chain disjoint; retry idempotent") {
    import graft.streaming.{EventsStream, StreamingFrontier}
    import org.apache.spark.sql.functions.{col, lit}
    def canon(u: String): String = Seq(u).toDF("url")
      .select(graft.text.UrlNormalize.canonicalUrl(col("url"))).head.getString(0)
    val (ua, ub, uc, ud) = ("https://x.example/a", "https://x.example/b",
      "https://x.example/c", "https://x.example/d")
    val visited0 = Seq(canon(ua)).toDF("canonical_url")
    // batch 0: a revisit of `a`, two sightings of `b`, one of `c`;
    // batch 1: `b` again (a revisit BY NOW — must not re-emit) + new `d`
    val b0 = Seq((1L, ua), (1L, ub), (2L, ub), (2L, uc)).toDF("doc_id", "url")
    val b1 = Seq((3L, ub), (3L, ud)).toDF("doc_id", "url")
    val out = graft.Scratch.dir("graft_sfr_test").toString
    val (aDir, vDir) = StreamingFrontier.drain(spark, visited0,
      EventsStream.replayOrdered(Seq(b0, b1)), out)
    val adds = spark.read.parquet(aDir).collect()
      .map(r => (r.getAs[String]("canonical_url"), r.getAs[Int]("shard"),
        r.getAs[Long]("n_links"), r.getAs[Long]("min_doc"))).toSet
    assert(adds == Set((canon(ub), 0, 2L, 1L), (canon(uc), 0, 1L, 2L),
      (canon(ud), 1, 1L, 3L)), adds.toString)
    // visited partials are DISJOINT and addition-sized: the plain union
    // (no distinct) has exactly seed + 3 rows
    val vis = spark.read.parquet(vDir).select("canonical_url").collect()
      .map(_.getString(0))
    assert(vis.length == 4 && vis.distinct.length == 4, vis.mkString(";"))
    // at-least-once retry: batch 1 recomputed from its predecessor set
    // reproduces its landed additions exactly
    val landed1 = spark.read.parquet(aDir).filter(col("shard") === 1)
      .select("canonical_url", "n_links", "min_doc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val recomputed = graft.ops.Frontier.additions(
        StreamingFrontier.visitedAsOf(spark, vDir, 1L), b1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(landed1 == recomputed && landed1.nonEmpty, s"$landed1 vs $recomputed")
  }

  test("StreamingComponents: shuffled replays merge to the from-scratch map; re-landing idempotent") {
    import graft.streaming.{EventsStream, StreamingComponents}
    import graft.dedup.Dedup
    import spark.implicits._
    // topology with every maintenance event: a long chain (spans any
    // batch split), two components a later pair MERGES, a clique, a
    // hub, and isolated pairs — 60 edges over ~50 nodes
    val pairs = (
      (1L to 15L).map(i => (i, i + 1)) ++            // chain 1..16
      Seq((20L, 21L), (21L, 22L), (30L, 31L), (31L, 32L), (22L, 30L)) ++ // merge
      (for (a <- 40L to 44L; b <- a + 1 to 44L) yield (a, b)) ++ // clique
      (50L to 58L).map(i => (100L, i)) ++            // hub
      Seq((70L, 71L), (72L, 73L))                    // islands
    ).toDF("id_a", "id_b")
    def mapOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val fromScratch = mapOf(Dedup.connectedComponents(pairs, "id_a", "id_b"))
    for (nFiles <- Seq(2, 4)) {
      val out = graft.Scratch.dir(s"graft_scc_test$nFiles").toString
      StreamingComponents.landPartials(spark,
        EventsStream.replayShuffled(pairs, nFiles), out)
      val merged = mapOf(StreamingComponents.mergedMap(spark, out))
      assert(merged == fromScratch, s"nFiles=$nFiles drifted: $merged")
      // at-least-once: re-draining the same pairs into the same dir
      // overwrites shards with batch-pure content — the map is unchanged
      StreamingComponents.landPartials(spark,
        EventsStream.replayShuffled(pairs, nFiles), out)
      assert(mapOf(StreamingComponents.mergedMap(spark, out)) == fromScratch,
        s"nFiles=$nFiles re-landing drifted")
      // LSM compaction is semantically free: fold shards ≤ 1 into one
      // partial, the merged map is unchanged node for node
      StreamingComponents.compact(spark, out, upTo = 1L)
      assert(mapOf(StreamingComponents.mergedMap(spark, out)) == fromScratch,
        s"nFiles=$nFiles compacted chain drifted")
    }
    // chained advance() == batch: fold three arbitrary slices by hand
    val slices = Seq(pairs.filter($"id_a" % 3 === 0), pairs.filter($"id_a" % 3 === 1),
      pairs.filter($"id_a" % 3 === 2))
    var standing = spark.emptyDataFrame
      .withColumn("id", org.apache.spark.sql.functions.lit(0L))
      .withColumn("cluster_id", org.apache.spark.sql.functions.lit(0L))
      .limit(0)
    slices.foreach { sl =>
      standing = StreamingComponents.advance(standing,
        Dedup.connectedComponents(sl, "id_a", "id_b"))
    }
    assert(mapOf(standing) == fromScratch, "chained advance drifted from batch")
  }

  test("StreamingCdx: shard union == batch build under re-offers; re-draining idempotent") {
    import graft.streaming.{EventsStream, StreamingCdx}
    import graft.sources.Warc
    val dir = graft.Scratch.dir("scdx_archives")
    def record(uri: String, body: String): Array[Byte] = Warc.recordBytes(
      "response", uri, "2026-08-16T00:00:00Z", s"<urn:uuid:$uri>",
      "application/http;msgtype=response",
      s"HTTP/1.1 200 OK\r\n\r\n$body".getBytes("UTF-8"))
    (0 until 5).foreach { i =>
      java.nio.file.Files.write(dir.resolve(s"part-$i.warc.gz"),
        (0 until 2).map(j => Warc.gzipMember(
          record(s"http://e.example/${i * 2 + j}", s"<p>doc ${i * 2 + j}</p>")))
          .reduce(_ ++ _))
    }
    val files = (0 until 5).map(i => dir.resolve(s"part-$i.warc.gz").toString)
    def asSet(df: org.apache.spark.sql.DataFrame) = df
      .select("file", "offset", "length", "target_uri", "digest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getString(4))).toSet
    val fromScratch = asSet(Warc.cdx(spark, files.mkString(",")))
    val standing = Warc.cdx(spark,
      Seq(files(0), files(2), files(4)).mkString(",")).localCheckpoint(true)
    for (nFiles <- Seq(2, 4)) {
      val out = graft.Scratch.dir(s"scdx_test$nFiles").toString
      // announce EVERY archive — the standing evens are re-offers the
      // prune must drop before any byte is read
      StreamingCdx.landPartials(spark, standing,
        EventsStream.replayShuffled(files.toDF("file"), nFiles), out)
      assert(asSet(StreamingCdx.merged(spark, out)) == fromScratch,
        s"nFiles=$nFiles drifted from batch build")
      // at-least-once: re-draining the same announcements into the same
      // chain rewrites shards whose union is unchanged
      StreamingCdx.landPartials(spark, standing,
        EventsStream.replayShuffled(files.toDF("file"), nFiles), out)
      assert(asSet(StreamingCdx.merged(spark, out)) == fromScratch,
        s"nFiles=$nFiles re-draining drifted")
    }
    org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("StreamingHostStats: shuffled replays sum-merge to the inline rollup") {
    import graft.streaming.{EventsStream, StreamingHostStats}
    import graft.ops.HostStats
    val docs = (0 until 40).map { i =>
      (i.toLong, s"http://h${i % 5}.example/p/$i", "x" * (i % 7 + 1), i % 3 == 0)
    }.toDF("doc_id", "url", "page", "spam")
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("host", "n_docs", "n_flagged", "sum_chars", "banned").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val inline = rows(HostStats.rollup(docs, "url", "spam", "page", 0.3))
    for (nFiles <- Seq(2, 4)) {
      val out = graft.Scratch.dir(s"shs_test$nFiles").toString
      StreamingHostStats.landCounts(spark,
        EventsStream.replayShuffled(docs, nFiles), "url", "spam", "page", out)
      val streamed = rows(HostStats.verdictsFrom(
        StreamingHostStats.mergedCounts(spark, out), 0.3))
      assert(streamed == inline && inline.nonEmpty,
        s"nFiles=$nFiles drifted: $streamed vs $inline")
    }
  }

  test("StreamingIvf: streamed chain == buildIndex + appendToIndex; probes agree") {
    import graft.streaming.{EventsStream, StreamingIvf}
    import graft.similarity.Ivf
    // two well-separated directions so cells are meaningful at dim 4;
    // ids 0-9 standing, 10-17 stream in — 16 is a ×4-scaled copy of
    // query 0 (direction-identical: same cell under any centroids)
    def vec(dir: Int, eps: Float): Array[Float] =
      if (dir == 0) Array(1f, eps, 0f, 0f) else Array(0f, eps, 1f, 0f)
    // eps period 9 is odd, so the only even id < 18 with eps 0 is the
    // query itself — no natural row repeats query 0's exact direction,
    // only the planted copy does
    val rows = (0 until 18).map { i =>
      val v = if (i == 16) Array(4f, 0f, 0f, 0f)
        else vec(i % 2, 0.01f * (i % 9))
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val standing = df.filter($"vec_id" < 10)
    val delta = df.filter($"vec_id" >= 10)
    val sDir = graft.Scratch.dir("sivf_stream").toString
    StreamingIvf.drain(spark, standing,
      EventsStream.replayShuffled(delta, nFiles = 3),
      "embedding", "vec_id", dim = 4, nCells = 2, sDir)
    val bDir = graft.Scratch.dir("sivf_batch").toString
    Ivf.buildIndex(standing, "embedding", "vec_id", dim = 4, nCells = 2,
      path = bDir)
    Ivf.appendToIndex(delta, "embedding", "vec_id", bDir)
    def idxSet(path: String) = spark.read.parquet(s"$path/data")
      .select("n_id", "cell", "n_nrm").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    assert(idxSet(sDir) == idxSet(bDir),
      "streamed index rows drifted from the batch lifecycle")
    val queries = df.filter($"vec_id" === 0L)
    def topOf(path: String) = Ivf.probeTopK(spark, path, queries,
      "embedding", "vec_id", k = 3, nProbe = 1).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq.sorted
    val streamedTop = topOf(sDir)
    assert(streamedTop == topOf(bDir), "probe answers drifted")
    // the streamed-in direction-identical copy is rank 1 at nProbe 1
    assert(streamedTop.head == ((0L, 1, 16L)), streamedTop.toString)
    // at-least-once: re-draining overwrites shards with pure content
    StreamingIvf.drain(spark, standing,
      EventsStream.replayShuffled(delta, nFiles = 3),
      "embedding", "vec_id", dim = 4, nCells = 2, sDir)
    assert(idxSet(sDir) == idxSet(bDir), "re-draining drifted")
  }
}
