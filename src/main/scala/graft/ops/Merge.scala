package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based mutation operators: the reference's Update Data tab
  * (SQL_DATA_INTEGRATION_TOOL.py:282-312 `update_data` — a per-row
  * `UPDATE ... WHERE [identifier] = ?` loop) re-expressed as distributed
  * merges. A 100 TB target is never iterated row-by-row: the delta joins the
  * target on the key, and when the delta is small it is broadcast so the
  * target is updated in a single map-side pass with zero shuffle of the
  * target table.
  */
object Merge {

  /** UPDATE target SET c = updates.c ... WHERE target.key = updates.key.
    * Rows without a matching update pass through unchanged. Only columns
    * present in `updates` (beyond the key) are overwritten — the analog of
    * the reference's column mapping. */
  def updateByKey(
      target: DataFrame,
      updates: DataFrame,
      key: String,
      broadcastUpdates: Boolean = true): DataFrame = {
    val setCols = updates.columns.filter(_ != key).toSet
    val u0 = updates.columns.filter(_ != key)
      .foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
    val right = if (broadcastUpdates) broadcast(u0) else u0
    val joined = target.join(right, Seq(key), "left_outer")
    val outCols: Seq[Column] = target.columns.toSeq.map { c =>
      if (setCols.contains(c)) coalesce(col(s"__u_$c"), col(c)).as(c) else col(c)
    }
    joined.select(outCols: _*)
  }

  /** Merge with insert-if-absent: matching keys take the update's values,
    * unmatched updates are appended, unmatched target rows pass through.
    * Requires `updates` to share the target's schema (maps absent columns to
    * null like the reference's unmapped-column handling). */
  def upsert(target: DataFrame, updates: DataFrame, key: String): DataFrame = {
    val t = target.columns.filter(_ != key)
      .foldLeft(target)((d, c) => d.withColumnRenamed(c, s"__t_$c"))
    val u = updates.columns.filter(_ != key)
      .foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__u_$c"))
    val joined = t.join(u, Seq(key), "full_outer")
    val outCols: Seq[Column] = col(key) +: target.columns.toSeq.filter(_ != key).map { c =>
      if (updates.columns.contains(c)) coalesce(col(s"__u_$c"), col(s"__t_$c")).as(c)
      else col(s"__t_$c").as(c)
    }
    joined.select(outCols: _*)
  }

  /** DELETE WHERE cond, as a filter-out rewrite (immutable-storage delete). */
  def deleteWhere(df: DataFrame, cond: Column): DataFrame =
    df.filter(!coalesce(cond, lit(false)))

  /** SCD Type-2 dimension history from a changelog: every change of `attr`
    * per `key` opens a version row [valid_from, valid_to), the latest
    * version has valid_to = NULL / is_current = true. The warehouse-side
    * complement of [[updateByKey]] — the reference's keyed update
    * (SQL_DATA_INTEGRATION_TOOL.py:282-312) overwrites in place; this keeps
    * the full audit history the way a dimension table would.
    *
    * Scale shape: two key-partitioned windows (lag to collapse no-op
    * repeats, lead over the surviving change rows for the closing
    * timestamp) — both shuffle once on `key` and stream within each key;
    * nothing is corpus-global. Ties on `tsCol` are broken by `tieBreak`
    * (a unique id) so version order is total and engine-portable. */
  def scd2FromChangelog(log: DataFrame, key: String, attr: String,
      tsCol: String, tieBreak: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(key)).orderBy(col(tsCol), col(tieBreak))
    // a key's FIRST row always opens a version: lag() is NULL there, and
    // for a leading-NULL attribute NULL <=> NULL would otherwise swallow
    // the opening row (losing the key's whole early history) — so the
    // first row is kept explicitly, not via the null-safe inequality
    val changes = log
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attr)))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .select(col(key), col(attr),
        col(tsCol).as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** Snapshot diff — the CDC *producer*: given two versions of a keyed
    * table, emit the insert/update/delete changelog that turns `old` into
    * `neu`. The complement of the repo's changelog *consumers*
    * ([[IncrementalAgg]] refreshes aggregates from one, StreamMerge applies
    * one continuously); together they close the loop a lakehouse
    * transaction log provides: diff yesterday's snapshot against today's
    * landing, feed the delta downstream — at 100 TB the changelog is
    * delta-sized while the naive alternative (recompute everything from
    * the new snapshot) is corpus-sized.
    *
    * Output: key columns, `op` ('I'|'U'|'D'), and the data columns —
    * new-side values for I/U (what a consumer applies), old-side values
    * for D (what a consumer retracts; the retraction discipline
    * IncrementalAgg.refresh expects). Unchanged rows emit nothing.
    * Comparison is null-safe per column (`<=>`), so NULL→value and
    * value→NULL transitions surface as updates.
    *
    * Scale shape: ONE full-outer equi-join on the key — both sides
    * shuffle once, co-partitioned, then the diff is a codegen projection;
    * no row-by-row iteration, no driver state. Column SETS must match
    * (order-insensitive: `neu` is aligned to `old`'s order); output
    * columns follow `old`'s order. */
  def snapshotDiff(old: DataFrame, neu: DataFrame, key: Seq[String]): DataFrame = {
    require(old.columns.toSet == neu.columns.toSet,
      s"snapshotDiff: column sets differ (${old.columns.mkString(",")} vs ${neu.columns.mkString(",")})")
    require(key.forall(old.columns.contains),
      s"snapshotDiff: key ${key.mkString(",")} not in columns")
    // collision-proof internal prefixes: grow until no user column
    // carries them (a user column literally named __o_x would otherwise
    // collide with the rename and make the join ambiguous)
    var p = "__"
    while (old.columns.exists(c => c.startsWith(s"${p}o_") ||
        c.startsWith(s"${p}n_") || c == s"${p}o_present" || c == s"${p}n_present"))
      p += "_"
    val (po, pn) = (s"${p}o_", s"${p}n_")
    val aligned = neu.select(old.columns.map(col).toSeq: _*)
    val dataCols = old.columns.filterNot(key.contains).toSeq
    val o = dataCols.foldLeft(old)((d, c) => d.withColumnRenamed(c, s"$po$c"))
      .withColumn(s"${po}present", lit(true))
    val n = dataCols.foldLeft(aligned)((d, c) => d.withColumnRenamed(c, s"$pn$c"))
      .withColumn(s"${pn}present", lit(true))
    val changed = dataCols.map(c => !(col(s"$po$c") <=> col(s"$pn$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    val op = when(col(s"${po}present").isNull, lit("I"))
      .when(col(s"${pn}present").isNull, lit("D"))
      .when(changed, lit("U"))
    val vals = dataCols.map(c =>
      when(op === "D", col(s"$po$c")).otherwise(col(s"$pn$c")).as(c))
    o.join(n, key, "full_outer")
      .select((key.map(col) :+ op.as("op")) ++ vals: _*)
      .filter(col("op").isNotNull)
  }

  /** Apply a [[snapshotDiff]] changelog to `old`, reproducing the new
    * snapshot — the consumer side of the CDC loop in one call
    * (apply(v0, snapshotDiff(v0, v1, k), k) == v1, the roundtrip
    * property OperatorsSpec asserts). Delta-sized work: touched keys
    * (U/D) leave via one anti-join, I/U rows append — the standing
    * table never shuffles. */
  def applyDiff(old: DataFrame, diff: DataFrame, key: Seq[String]): DataFrame = {
    val touched = diff.filter(col("op").isin("U", "D"))
      .select(key.map(col): _*).distinct()
    old.join(touched, key, "left_anti")
      .unionByName(diff.filter(col("op").isin("I", "U")).drop("op"))
      .select(old.columns.map(col).toSeq: _*)
  }
}
