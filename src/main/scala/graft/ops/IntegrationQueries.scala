package graft.ops

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.catalog.Catalog
import graft.sources.{ColumnSpec, MappedImport, Tables}

/** The reference's integration workflows (import / update / delete /
  * metadata / report prep / JSON columns) bound to the test tables.
  * See MappedImport, Merge, Reports, Catalog for the operator semantics and
  * reference line citations.
  */
object IntegrationQueries {

  val defs: Seq[QueryDef] = Seq(

    // Excel-import analog: column subset + rename + cast + transform, all
    // compiled into one scan-time projection (ref 579-671).
    QueryDef("q17_import_mapped", (s, dir) => {
      val events = Tables.load(s, dir, "events")
      MappedImport(events, Seq(
        ColumnSpec("event_id", "id"),
        ColumnSpec("event_type", "kind", transform = Some(c => upper(c))),
        ColumnSpec("value", "amount", castTo = Some("double")),
        ColumnSpec("ts", "event_time",
          transform = Some(c => date_format(c, "yyyy-MM-dd HH:mm:ss")))
      )).orderBy("id")
    }, Some("""
      SELECT event_id AS id, upper(event_type) AS kind, CAST(value AS DOUBLE) AS amount,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_time
      FROM events ORDER BY id""")),

    // Keyed UPDATE from a mapped delta (ref 282-312), as a broadcast merge.
    QueryDef("q18_update_merge", (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val updates = orders.filter($"o_orderstatus" === "O")
        .select($"o_orderkey", ($"o_totalprice" + lit(500.0)).as("o_totalprice"))
      Merge.updateByKey(orders, updates, "o_orderkey")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 500.0 ELSE o_totalprice END AS o_totalprice
      FROM orders ORDER BY o_orderkey""")),

    // Merge with insert-if-absent: update matches, append the rest.
    QueryDef("q19_upsert", (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val target = orders.filter($"o_orderkey" % 3 =!= 0)
        .select($"o_orderkey", $"o_totalprice", $"o_orderstatus")
      val updates = orders.filter($"o_orderkey" % 2 === 0)
        .select($"o_orderkey", ($"o_totalprice" + lit(1000.0)).as("o_totalprice"),
          lit("U").as("o_orderstatus"))
      Merge.upsert(target, updates, "o_orderkey").orderBy($"o_orderkey")
    }, Some("""
      SELECT COALESCE(u.o_orderkey, t.o_orderkey) AS o_orderkey,
             COALESCE(u.o_totalprice, t.o_totalprice) AS o_totalprice,
             COALESCE(u.o_orderstatus, t.o_orderstatus) AS o_orderstatus
      FROM (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0) t
      FULL OUTER JOIN (SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice, 'U' AS o_orderstatus
                       FROM orders WHERE o_orderkey % 2 = 0) u
        ON t.o_orderkey = u.o_orderkey
      ORDER BY o_orderkey""")),

    // DELETE WHERE as filter-out rewrite.
    QueryDef("q20_delete_where", (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      Merge.deleteWhere(orders, $"o_orderstatus" === "F" && year($"o_orderdate") < 1998)
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS n FROM orders
      WHERE NOT (o_orderstatus = 'F' AND year(o_orderdate) < 1998)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Schema introspection (ref 183-220); oracle maps DuckDB's DESCRIBE
    // type names onto Spark simpleStrings.
    QueryDef("q21_table_design", (s, dir) => {
      Catalog.tableDesign(s, Tables.load(s, dir, "lineitem"))
    }, Some("""
      SELECT column_name,
             CASE column_type WHEN 'BIGINT' THEN 'bigint' WHEN 'INTEGER' THEN 'int'
                  WHEN 'DOUBLE' THEN 'double' WHEN 'VARCHAR' THEN 'string'
                  WHEN 'TIMESTAMP' THEN 'timestamp'
                  ELSE lower(column_type) END AS data_type,
             ("null" = 'YES') AS is_nullable,
             CAST("default" AS VARCHAR) AS column_default
      FROM (DESCRIBE SELECT * FROM lineitem)
      ORDER BY column_name""")),

    // Dynamic-report prep: bar/pie group-sum (ref 1262).
    QueryDef("q22_report_groupsum", (s, dir) => {
      Reports.groupSum(Tables.load(s, dir, "customer"), "c_mktsegment", "c_acctbal")
    }, Some("""
      SELECT c_mktsegment, CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_c_acctbal
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""")),

    // Dynamic-report prep: value_counts (ref 1264).
    QueryDef("q23_value_counts", (s, dir) => {
      Reports.valueCounts(Tables.load(s, dir, "orders"), "o_orderpriority")
    }, Some("""
      SELECT o_orderpriority AS value, COUNT(*) AS n FROM orders
      GROUP BY o_orderpriority ORDER BY n DESC, value""")),

    // Salted two-stage aggregation (hot-key mitigation) — must equal the
    // plain GROUP BY; decimal-exact partials keep it bit-stable under any
    // salt split.
    QueryDef("q39_skew_agg", (s, dir) => {
      import s.implicits._
      Skew.saltedSumCount(Tables.load(s, dir, "lineitem"), Seq("l_returnflag"),
        "l_quantity", saltBuckets = 16)
        .withColumnRenamed("sum_l_quantity", "sum_qty")
        .orderBy($"l_returnflag")
    }, Some("""
      SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Exact DISTINCT aggregation per window (the expensive shape
    // ApproxDistinctRule can rewrite to HLL++ when opted in).
    QueryDef("q40_distinct_users", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(date_format(date_trunc("day", $"ts"), "yyyy-MM-dd").as("day"))
        .agg(count_distinct($"user_id").as("n_users"), count(lit(1)).as("n_events"))
        .orderBy($"day")
    }, Some("""
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      FROM events GROUP BY 1 ORDER BY 1""")),

    // GROUPING SETS via ROLLUP (subtotal rows labeled 'ALL').
    QueryDef("q41_rollup", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "orders")
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,4)")).cast("double").as("sum_price"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"n", $"sum_price")
        .orderBy($"status", $"priority")
    }, Some("""
      SELECT COALESCE(o_orderstatus, 'ALL') AS status,
             COALESCE(o_orderpriority, 'ALL') AS priority,
             COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY status, priority""")),

    // Semi-structured column: JSON extraction + aggregation.
    QueryDef("q24_json_extract", (s, dir) => {
      import s.implicits._
      Tables.load(s, dir, "events")
        .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k".cast("long")).as("sum_k"))
        .orderBy($"event_type")
    }, Some("""
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // SCD Type-2 history build (Merge.scd2FromChangelog): the audit-keeping
    // complement of the reference's in-place keyed update — each event_type
    // change per user opens a version row with [valid_from, valid_to) and
    // an is_current flag. Two key-partitioned windows, one shuffle on
    // user_id; the user_id predicate prunes at the scan.
    QueryDef("q78_scd2", (s, dir) => {
      import s.implicits._
      val ev = Tables.load(s, dir, "events").filter($"user_id" < 50)
        .select($"user_id", $"event_type", $"ts", $"event_id")
      Merge.scd2FromChangelog(ev, "user_id", "event_type", "ts", "event_id")
        .select($"user_id", $"event_type",
          date_format($"valid_from", "yyyy-MM-dd HH:mm:ss").as("valid_from"),
          date_format($"valid_to", "yyyy-MM-dd HH:mm:ss").as("valid_to"),
          $"is_current")
        .orderBy($"user_id", $"valid_from")
    }, Some("""
      WITH ev AS (
        SELECT user_id, event_type, ts, event_id FROM events WHERE user_id < 50),
      lagged AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM ev),
      chg AS (
        SELECT user_id, event_type, ts, event_id FROM lagged
        WHERE prev IS NULL OR prev <> event_type)
      SELECT user_id, event_type,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
             strftime(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                      '%Y-%m-%d %H:%M:%S') AS valid_to,
             (LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL) AS is_current
      FROM chg ORDER BY user_id, valid_from""")),

    // Incremental materialized-aggregate maintenance (IncrementalAgg):
    // yesterday's snapshot aggregate + today's insert/delete changelog →
    // refreshed report, O(delta + affected keys), never a history rescan.
    // The oracle recomputes the same report from the final logical table:
    // base = orders with key%10≠0, inserts = key%10=0, deletes = base
    // rows with key%7=0 — so the live set is key%10=0 OR key%7≠0.
    QueryDef("q91_incremental_agg", (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val base = orders.filter($"o_orderkey" % 10 =!= 0)
      val baseAgg = IncrementalAgg.groupSum(base, Seq("o_orderstatus"), "o_totalprice")
      val changelog = orders.filter($"o_orderkey" % 10 === 0).withColumn("op", lit(1))
        .unionByName(base.filter($"o_orderkey" % 7 === 0).withColumn("op", lit(-1)))
      IncrementalAgg.refresh(baseAgg, changelog, Seq("o_orderstatus"), "o_totalprice")
        .select($"o_orderstatus", $"cnt",
          $"sum_dec".cast("double").as("sum_price"))
        .orderBy($"o_orderstatus")
    }, Some("""
      SELECT o_orderstatus, COUNT(*) AS cnt,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_orderkey % 10 = 0 OR o_orderkey % 7 <> 0
      GROUP BY 1 ORDER BY 1""")),

    // Fuzzy entity matching (graft.text.EditDistanceJoin — PassJoin):
    // the record-linkage step the reference's exact-key import/update
    // cannot do. Canonicalize the part-name vocabulary (distinct names
    // with their part counts — ER runs over the vocabulary, never the
    // raw corpus), then the partition-based similarity self-join finds
    // every name pair within edit distance 2 — as a shuffled EQUI-join
    // on (length, segment-ordinal, segment) with a codegen'd
    // levenshtein verify, never the O(n²) cross join the oracle runs.
    // The name doubles as the join id: ids are compared with `<`, and
    // ASCII lexicographic order agrees between Spark and DuckDB, so the
    // canonical orientation matches the oracle's `a.p_name < b.p_name`.
    QueryDef("q102_fuzzy_match", (s, dir) => {
      import s.implicits._
      val names = Tables.load(s, dir, "part")
        .groupBy($"p_name").agg(count(lit(1)).as("n_parts"))
      val pairs = graft.text.EditDistanceJoin.selfJoin(names, "p_name", "p_name", k = 2)
      pairs
        .join(broadcast(names.select($"p_name".as("id_a"), $"n_parts".as("n_a"))), "id_a")
        .join(broadcast(names.select($"p_name".as("id_b"), $"n_parts".as("n_b"))), "id_b")
        .select($"id_a".as("name_a"), $"id_b".as("name_b"), $"dist", $"n_a", $"n_b")
        .orderBy($"name_a", $"name_b")
    }, Some("""
      WITH names AS (
        SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY 1)
      SELECT a.p_name AS name_a, b.p_name AS name_b,
             CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist,
             a.n_parts AS n_a, b.n_parts AS n_b
      FROM names a JOIN names b ON a.p_name < b.p_name
      WHERE levenshtein(a.p_name, b.p_name) <= 2
      ORDER BY name_a, name_b""")),

    // Golden-record survivorship (MDM merge) — the step AFTER q102's
    // fuzzy matching that an integration tool actually ships: matched
    // name variants close into entity clusters (q69's connected
    // components; string names ride as md5_60 ids per the house
    // portable-hashing discipline — birthday risk n²/2⁶¹, negligible at
    // catalog scale, stated) and each cluster merges to ONE golden row:
    // golden_name = min member name, attribute survivorship = most
    // frequent value with a deterministic (n desc, value desc) tie-break
    // (the q130 total-order-vote trick as max(struct)), ranges kept as
    // min/max. Pairs and clusters are answer-sized (the q102 segment
    // join, never O(n²) — the oracle runs the quadratic join + recursive
    // closure).
    QueryDef("q185_golden_record", (s, dir) => {
      import s.implicits._
      def h(c: org.apache.spark.sql.Column) =
        pmod(conv(substring(md5(concat(lit("gr:"), c)), 1, 15), 16, 10)
          .cast("long"), lit(1152921504606846976L))
      val parts = Tables.load(s, dir, "part")
      val names = parts.groupBy($"p_name").agg(count(lit(1)).as("n_parts"))
      val pairs = graft.text.EditDistanceJoin
        .selfJoin(names, "p_name", "p_name", k = 2)
      val cl = graft.dedup.Dedup.connectedComponents(
        pairs.select(h($"id_a").as("ha"), h($"id_b").as("hb")), "ha", "hb")
      val members = pairs.select($"id_a".as("p_name"))
        .unionByName(pairs.select($"id_b".as("p_name"))).distinct()
        .join(cl, h($"p_name") === cl("id"))
        .select($"p_name", $"cluster_id")
        .join(parts, "p_name")
      val brandMode = members.groupBy($"cluster_id", $"p_brand")
        .agg(count(lit(1)).as("n"))
        .groupBy($"cluster_id")
        .agg(max(struct($"n", $"p_brand")).as("bm"))
        .select($"cluster_id", $"bm.p_brand".as("brand_mode"))
      members.groupBy($"cluster_id")
        .agg(min($"p_name").as("golden_name"),
          countDistinct($"p_name").as("n_names"),
          count(lit(1)).as("n_parts"),
          min($"p_retailprice").as("min_price"),
          max($"p_retailprice").as("max_price"))
        .join(brandMode, "cluster_id")
        .select($"golden_name", $"n_names", $"n_parts", $"brand_mode",
          $"min_price", $"max_price")
        .orderBy($"golden_name")
    }, Some("""
      WITH RECURSIVE names AS (SELECT p_name, COUNT(*) AS n FROM part GROUP BY 1),
      prs AS (
        SELECT a.p_name AS u, b.p_name AS v
        FROM names a JOIN names b ON a.p_name < b.p_name
        WHERE levenshtein(a.p_name, b.p_name) <= 2),
      edges AS (SELECT u, v FROM prs UNION SELECT v, u FROM prs),
      reach(u, r) AS (
        SELECT u, u FROM edges
        UNION
        SELECT e.u, rr.r FROM edges e JOIN reach rr ON e.v = rr.u),
      cl AS (SELECT u AS p_name, MIN(r) AS cluster_id FROM reach GROUP BY u),
      mem AS (SELECT cl.cluster_id, p.p_name, p.p_brand, p.p_retailprice
              FROM cl JOIN part p ON p.p_name = cl.p_name),
      bm AS (SELECT cluster_id, p_brand, COUNT(*) AS n FROM mem GROUP BY 1, 2),
      bmr AS (SELECT cluster_id, p_brand AS brand_mode FROM (
                SELECT cluster_id, p_brand, n,
                       ROW_NUMBER() OVER (PARTITION BY cluster_id
                         ORDER BY n DESC, p_brand DESC) AS rk
                FROM bm) WHERE rk = 1),
      ag AS (SELECT cluster_id, MIN(p_name) AS golden_name,
                    COUNT(DISTINCT p_name) AS n_names, COUNT(*) AS n_parts,
                    MIN(p_retailprice) AS min_price, MAX(p_retailprice) AS max_price
             FROM mem GROUP BY 1)
      SELECT ag.golden_name, ag.n_names, ag.n_parts, bmr.brand_mode,
             ag.min_price, ag.max_price
      FROM ag JOIN bmr ON bmr.cluster_id = ag.cluster_id
      ORDER BY ag.golden_name""")),

    // Snapshot diff (Merge.snapshotDiff): derive a v1 of orders by a
    // deterministic recipe both engines state identically (drop keys
    // %97==0, bump price on %13==0, append fresh keys for %101==0),
    // then the OPERATOR reconstructs exactly that I/U/D changelog from
    // the two snapshots alone — one full-outer key join, delta-sized
    // output. The oracle runs the textbook FULL OUTER JOIN + IS
    // DISTINCT FROM formulation.
    QueryDef("q106_snapshot_diff", (s, dir) => {
      import s.implicits._
      val v0 = Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
      val v1 = v0.filter($"o_orderkey" % 97 =!= 0)
        .withColumn("o_totalprice",
          when($"o_orderkey" % 13 === 0, $"o_totalprice" + 10.0)
            .otherwise($"o_totalprice"))
        .unionByName(v0.filter($"o_orderkey" % 101 === 0)
          .select(($"o_orderkey" + 100000000L).as("o_orderkey"),
            $"o_custkey", $"o_totalprice", $"o_orderpriority"))
      Merge.snapshotDiff(v0, v1, Seq("o_orderkey"))
        .orderBy($"o_orderkey")
    }, Some("""
      WITH v0 AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority FROM orders),
      v1 AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 10.0
                    ELSE o_totalprice END AS o_totalprice,
               o_orderpriority
        FROM v0 WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_custkey, o_totalprice, o_orderpriority
        FROM v0 WHERE o_orderkey % 101 = 0)
      SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
             CASE WHEN a.o_orderkey IS NULL THEN 'I'
                  WHEN b.o_orderkey IS NULL THEN 'D'
                  WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
                    OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
                    OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
                    THEN 'U' END AS op,
             CASE WHEN b.o_orderkey IS NULL THEN a.o_custkey ELSE b.o_custkey END AS o_custkey,
             CASE WHEN b.o_orderkey IS NULL THEN a.o_totalprice ELSE b.o_totalprice END AS o_totalprice,
             CASE WHEN b.o_orderkey IS NULL THEN a.o_orderpriority ELSE b.o_orderpriority END AS o_orderpriority
      FROM v0 a FULL OUTER JOIN v1 b ON a.o_orderkey = b.o_orderkey
      WHERE CASE WHEN a.o_orderkey IS NULL THEN 'I'
                 WHEN b.o_orderkey IS NULL THEN 'D'
                 WHEN a.o_custkey IS DISTINCT FROM b.o_custkey
                   OR a.o_totalprice IS DISTINCT FROM b.o_totalprice
                   OR a.o_orderpriority IS DISTINCT FROM b.o_orderpriority
                   THEN 'U' END IS NOT NULL
      ORDER BY o_orderkey""")),

    // Incremental join maintenance (IncrementalJoin): the denormalized
    // orders⋈customer view refreshed by a fact-side changelog — deletes
    // (base keys %50==0) retract their view rows via a broadcast
    // anti-join, inserts (a later date window) join ONLY the delta
    // against the dimension. The oracle recomputes the same final view
    // from scratch — hash equality proves the delta path loses and
    // invents nothing. Delta-sized join work; the standing view never
    // re-joins.
    QueryDef("q112_incremental_join", (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
      val dim = Tables.load(s, dir, "customer")
        .select($"c_custkey".as("o_custkey"), $"c_name", $"c_mktsegment")
      val base = orders.filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      val view0 = IncrementalJoin.materialize(base, broadcast(dim), "o_custkey")
      val log = base.filter($"o_orderkey" % 50 === 0).withColumn("op", lit(-1))
        .unionByName(orders
          .filter($"o_orderdate" >= lit("1998-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1999-01-01").cast("timestamp"))
          .withColumn("op", lit(1)))
      IncrementalJoin.refresh(view0, log, broadcast(dim), "o_custkey", "o_orderkey")
        .select($"o_orderkey", $"o_custkey",
          date_format($"o_orderdate", "yyyy-MM-dd").as("o_orderdate"),
          $"o_totalprice", $"c_name", $"c_mktsegment")
        .orderBy($"o_orderkey")
    }, Some("""
      SELECT o.o_orderkey, o.o_custkey,
             strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
             o.o_totalprice, c.c_name, c.c_mktsegment
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE (o.o_orderdate < TIMESTAMP '1998-01-01' AND o.o_orderkey % 50 <> 0)
         OR (o.o_orderdate >= TIMESTAMP '1998-01-01'
             AND o.o_orderdate < TIMESTAMP '1999-01-01')
      ORDER BY o.o_orderkey""")),

    // Dimension-side incremental join maintenance (the symmetric leg
    // q112 leaves to IncrementalJoin.refreshDim): the orders⋈customer
    // view refreshed by a CUSTOMER changelog — deletes (custkey %30==0)
    // retract every order of the key via one broadcast anti-join ON THE
    // JOIN KEY (not the fact id — the dim-side difference), updates
    // (%7==0, as del+ins retraction pairs) bring the key's orders back
    // from the fact side with the new attributes. The oracle recomputes
    // the final view from the post-changelog dimension — hash equality
    // proves key-level retraction loses exactly the retracted keys'
    // rows and the re-join restores the updated ones.
    QueryDef("q118_incremental_join_dim", (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val dim = Tables.load(s, dir, "customer")
        .select($"c_custkey".as("o_custkey"), $"c_name", $"c_mktsegment")
      val view0 = IncrementalJoin.materialize(orders, broadcast(dim), "o_custkey")
      val dlog = dim.filter($"o_custkey" % 30 === 0 || $"o_custkey" % 7 === 0)
        .withColumn("op", lit(-1))
        .unionByName(dim
          .filter($"o_custkey" % 7 === 0 && $"o_custkey" % 30 =!= 0)
          .withColumn("c_mktsegment", concat(lit("X-"), $"c_mktsegment"))
          .withColumn("op", lit(1)))
      IncrementalJoin.refreshDim(view0, dlog, orders, "o_custkey")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          $"c_name", $"c_mktsegment")
        .orderBy($"o_orderkey")
    }, Some("""
      WITH d1 AS (
        SELECT c_custkey, c_name,
               CASE WHEN c_custkey % 7 = 0 THEN 'X-' || c_mktsegment
                    ELSE c_mktsegment END AS c_mktsegment
        FROM customer WHERE c_custkey % 30 <> 0)
      SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, d.c_name, d.c_mktsegment
      FROM orders o JOIN d1 d ON o.o_custkey = d.c_custkey
      ORDER BY o.o_orderkey""")),

    // Single-pass column profiling (ops/Profile.scala — the reference's
    // table-analysis surface as one oracle-checkable relation; the
    // Deequ-class "what is in this table" report an import tool runs on
    // every landed file). Schema-driven type routing: numerics surface
    // min/max as doubles (selected values, never arithmetic), strings
    // as-is, timestamps formatted. Exact per-column distinct counts ride
    // the standard multi-count-DISTINCT expand — one map-side-combined
    // shuffle.
    QueryDef("q160_profile", (s, dir) => {
      import s.implicits._
      Profile.profile(Tables.load(s, dir, "orders")).orderBy($"col_name")
    }, Some("""
      WITH a AS (
        SELECT COUNT(*) AS nr,
               COUNT(o_orderkey) AS c1, COUNT(DISTINCT o_orderkey) AS d1,
               MIN(o_orderkey) AS mn1, MAX(o_orderkey) AS mx1,
               COUNT(o_custkey) AS c2, COUNT(DISTINCT o_custkey) AS d2,
               MIN(o_custkey) AS mn2, MAX(o_custkey) AS mx2,
               COUNT(o_orderstatus) AS c3, COUNT(DISTINCT o_orderstatus) AS d3,
               MIN(o_orderstatus) AS mn3, MAX(o_orderstatus) AS mx3,
               COUNT(o_totalprice) AS c4, COUNT(DISTINCT o_totalprice) AS d4,
               MIN(o_totalprice) AS mn4, MAX(o_totalprice) AS mx4,
               COUNT(o_orderdate) AS c5, COUNT(DISTINCT o_orderdate) AS d5,
               MIN(o_orderdate) AS mn5, MAX(o_orderdate) AS mx5,
               COUNT(o_orderpriority) AS c6, COUNT(DISTINCT o_orderpriority) AS d6,
               MIN(o_orderpriority) AS mn6, MAX(o_orderpriority) AS mx6
        FROM orders)
      SELECT col_name, n_rows, n_nulls, n_distinct, min_num, max_num, min_str, max_str
      FROM (
        SELECT 'o_orderkey' AS col_name, nr AS n_rows, nr - c1 AS n_nulls, d1 AS n_distinct,
               CAST(mn1 AS DOUBLE) AS min_num, CAST(mx1 AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM a
        UNION ALL
        SELECT 'o_custkey', nr, nr - c2, d2,
               CAST(mn2 AS DOUBLE), CAST(mx2 AS DOUBLE), NULL, NULL FROM a
        UNION ALL
        SELECT 'o_orderstatus', nr, nr - c3, d3, NULL, NULL, mn3, mx3 FROM a
        UNION ALL
        SELECT 'o_totalprice', nr, nr - c4, d4, mn4, mx4, NULL, NULL FROM a
        UNION ALL
        SELECT 'o_orderdate', nr, nr - c5, d5, NULL, NULL,
               strftime(mn5, '%Y-%m-%d %H:%M:%S'), strftime(mx5, '%Y-%m-%d %H:%M:%S') FROM a
        UNION ALL
        SELECT 'o_orderpriority', nr, nr - c6, d6, NULL, NULL, mn6, mx6 FROM a)
      ORDER BY col_name""")),

    // k-anonymity audit — the data-governance gate before a table leaves
    // the pipeline: every quasi-identifier combination shared by fewer
    // than k individuals re-identifies them (Sweeney 2002). Quasi-ids:
    // (market segment, nation, account-balance band of 2000) — the band
    // is ONE floor(x/2000) on the raw double, an identical single op
    // chain in both engines, and makes the flag non-degenerate at every
    // sf (578 at-risk classes at sf0.01, 2 even at sf0.1). k = 5. One
    // map-side-combined groupBy; output = at-risk classes only (the
    // census a governance report acts on) + a '__summary' row (at-risk
    // classes / total classes / exposed individuals), all exact ints.
    QueryDef("q167_kanon", (s, dir) => {
      import s.implicits._
      val classes = Tables.load(s, dir, "customer")
        .groupBy($"c_mktsegment", $"c_nationkey",
          floor($"c_acctbal" / 2000d).cast("long").as("bal_band"))
        .agg(count(lit(1)).as("n"))
      val risky = classes.filter($"n" < 5)
        .select($"c_mktsegment", $"c_nationkey".cast("long").as("c_nationkey"),
          $"bal_band", $"n")
      val summary = classes.agg(
          sum(when($"n" < 5, 1L).otherwise(0L)).as("nr"),
          count(lit(1)).as("total"),
          sum(when($"n" < 5, $"n").otherwise(0L)).as("exposed"))
        .select(lit("__summary").as("c_mktsegment"), $"nr".as("c_nationkey"),
          $"total".as("bal_band"), $"exposed".as("n"))
      risky.unionByName(summary)
        .orderBy($"c_mktsegment", $"c_nationkey", $"bal_band")
    }, Some("""
      WITH cls AS (
        SELECT c_mktsegment, c_nationkey,
               CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band, COUNT(*) AS n
        FROM customer GROUP BY 1, 2, 3)
      SELECT c_mktsegment, CAST(c_nationkey AS BIGINT) AS c_nationkey, bal_band, n
      FROM cls WHERE n < 5
      UNION ALL
      SELECT '__summary',
             CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(*),
             CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      FROM cls
      ORDER BY c_mktsegment, c_nationkey, bal_band""")),

    // Referential-integrity audit — the import-QC check an integration
    // tool runs after every load: child keys with no parent row are
    // orphans (broken joins downstream). One anti-join per FK edge —
    // the orphan summary is answer-sized. Parents are deterministically
    // THINNED in both engines (every 13th order / 17th customer
    // removed) so the orphan path is exercised at every sf, not just on
    // hypothetically-dirty data.
    QueryDef("q171_fk_audit", (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val parentOrders = orders.filter($"o_orderkey" % 13 =!= 0)
      val parentCust = Tables.load(s, dir, "customer")
        .filter($"c_custkey" % 17 =!= 0)
      Profile.fkAudit(Tables.load(s, dir, "lineitem"), "l_orderkey",
          parentOrders, "o_orderkey", "lineitem.l_orderkey->orders")
        .unionByName(Profile.fkAudit(orders, "o_custkey",
          parentCust, "c_custkey", "orders.o_custkey->customer"))
        .orderBy($"fk")
    }, Some("""
      WITH po AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 13 <> 0),
      pc AS (SELECT c_custkey FROM customer WHERE c_custkey % 17 <> 0),
      o1 AS (SELECT l_orderkey AS k FROM lineitem
             WHERE l_orderkey NOT IN (SELECT o_orderkey FROM po)),
      o2 AS (SELECT o_custkey AS k FROM orders
             WHERE o_custkey NOT IN (SELECT c_custkey FROM pc))
      SELECT 'lineitem.l_orderkey->orders' AS fk,
             (SELECT COUNT(*) FROM lineitem) AS n_child,
             (SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL) AS n_null_keys,
             COUNT(*) AS n_orphans, MIN(k) AS min_key, MAX(k) AS max_key
      FROM o1
      UNION ALL
      SELECT 'orders.o_custkey->customer',
             (SELECT COUNT(*) FROM orders),
             (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
             COUNT(*), MIN(k), MAX(k)
      FROM o2
      ORDER BY fk""")),

    // Schema/statistics drift between two loads (Profile.drift): the
    // import-QC report an integration tool runs when the next vendor
    // drop lands — q160 profiles ONE table, this diffs two profiles
    // column-by-column with added/removed detection (full-outer on
    // col_name). Snapshots are the deterministic orderkey-parity halves
    // of orders; plants exercise every drift class in both engines:
    // snapshot B drops o_orderstatus entirely (status='removed'), NULLs
    // o_orderpriority on every 31st key (null_ppm drift), and shifts
    // o_totalprice by +100000 (range_same=false beyond the trivial
    // key-parity min/max offsets). Exact integer ppm (truncating div,
    // §5); range_same is NULL (not false) on removed rows.
    QueryDef("q180_schema_drift", (s, dir) => {
      import s.implicits._
      val orders = Tables.load(s, dir, "orders")
      val a = orders.filter($"o_orderkey" % 2 === 0)
      val b = orders.filter($"o_orderkey" % 2 === 1)
        .select($"o_orderkey", $"o_custkey",
          ($"o_totalprice" + 100000.0d).as("o_totalprice"),
          $"o_orderdate",
          when($"o_orderkey" % 31 === 0, lit(null).cast("string"))
            .otherwise($"o_orderpriority").as("o_orderpriority"))
      Profile.drift(a, b).orderBy($"col_name")
    }, Some {
      def prof(src: String, cols: Seq[(String, String)]): String = {
        // kind: "num" -> min/max as double; "str" -> varchar; "date" -> formatted
        val aggs = cols.zipWithIndex.map { case ((c, _), i) =>
          s"COUNT($c) AS c$i, COUNT(DISTINCT $c) AS d$i, MIN($c) AS mn$i, MAX($c) AS mx$i"
        }.mkString(",\n               ")
        val rows = cols.zipWithIndex.map { case ((c, kind), i) =>
          val (mnNum, mxNum, mnStr, mxStr) = kind match {
            case "num" => (s"CAST(mn$i AS DOUBLE)", s"CAST(mx$i AS DOUBLE)",
              "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
            case "date" => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)",
              s"strftime(mn$i, '%Y-%m-%d %H:%M:%S')", s"strftime(mx$i, '%Y-%m-%d %H:%M:%S')")
            case _ => ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)", s"mn$i", s"mx$i")
          }
          s"""SELECT '$c' AS col_name, nr AS n_rows, nr - c$i AS n_nulls, d$i AS n_distinct,
               $mnNum AS min_num, $mxNum AS max_num, $mnStr AS min_str, $mxStr AS max_str FROM agg_$src"""
        }.mkString("\n        UNION ALL\n        ")
        s"""agg_$src AS (
        SELECT COUNT(*) AS nr,
               $aggs
        FROM $src),
      p_$src AS (
        $rows)"""
      }
      val colsA = Seq("o_orderkey" -> "num", "o_custkey" -> "num",
        "o_orderstatus" -> "str", "o_totalprice" -> "num",
        "o_orderdate" -> "date", "o_orderpriority" -> "str")
      val colsB = Seq("o_orderkey" -> "num", "o_custkey" -> "num",
        "o_totalprice" -> "num", "o_orderdate" -> "date",
        "o_orderpriority" -> "str")
      s"""
      WITH sa AS (SELECT * FROM orders WHERE o_orderkey % 2 = 0),
      sb AS (
        SELECT o_orderkey, o_custkey, o_totalprice + 100000.0 AS o_totalprice,
               o_orderdate,
               CASE WHEN o_orderkey % 31 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority
        FROM orders WHERE o_orderkey % 2 = 1),
      ${prof("sa", colsA)},
      ${prof("sb", colsB)}
      SELECT COALESCE(a.col_name, b.col_name) AS col_name,
             CASE WHEN b.col_name IS NULL THEN 'removed'
                  WHEN a.col_name IS NULL THEN 'added'
                  ELSE 'ok' END AS status,
             a.n_rows AS n_rows_a, b.n_rows AS n_rows_b,
             a.n_nulls * 1000000 // a.n_rows AS null_ppm_a,
             b.n_nulls * 1000000 // b.n_rows AS null_ppm_b,
             a.n_distinct AS n_distinct_a, b.n_distinct AS n_distinct_b,
             CASE WHEN a.col_name IS NULL OR b.col_name IS NULL THEN NULL
                  ELSE (a.min_num IS NOT DISTINCT FROM b.min_num)
                   AND (a.max_num IS NOT DISTINCT FROM b.max_num)
                   AND (a.min_str IS NOT DISTINCT FROM b.min_str)
                   AND (a.max_str IS NOT DISTINCT FROM b.max_str) END AS range_same
      FROM p_sa a FULL OUTER JOIN p_sb b ON b.col_name = a.col_name
      ORDER BY col_name"""
    })
  )
}
