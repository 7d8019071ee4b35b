package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass column profiling — the automated "what is in this table"
  * report a data-integration tool runs on every import (the reference's
  * table-analysis surface, SQL_DATA_INTEGRATION_TOOL.py:222–260
  * analyze/describe, as one oracle-checkable relation; the engine's
  * `Catalog.analyzeTable` is the catalog-side sibling). One row per
  * column: (col_name, n_rows, n_nulls, n_distinct, min_num, max_num,
  * min_str, max_str) — numeric columns surface min/max as doubles
  * (SELECTED values, never arithmetic: a long < 2^53 casts exactly and a
  * double min/max is bit-identical cross-engine), strings as-is, and
  * timestamps as formatted strings (§5 timestamp protocol). Type
  * routing is schema-driven, so the operator profiles any table.
  *
  * Scale shape: ONE aggregation pass — count/min/max are plain partial
  * aggregates; the exact per-column distinct counts ride Spark's
  * multi-count-DISTINCT expand (k+1 aggregation groups through one
  * map-side-combined shuffle — the standard exact plan; swap in the
  * q128 HLL registers per column when 100 TB exactness isn't worth the
  * expand multiplier, stated honestly). The per-column reshape explodes
  * a literal struct array over the ONE aggregated row — answer-sized.
  */
object Profile {

  def profile(df: DataFrame): DataFrame = {
    val fields = df.schema.fields.toSeq
    def aggsFor(f: StructField): Seq[Column] = {
      val c = col(f.name)
      Seq(count(c).as(s"cnt_${f.name}"),
        countDistinct(c).as(s"nd_${f.name}"),
        min(c).as(s"mn_${f.name}"),
        max(c).as(s"mx_${f.name}"))
    }
    val aggd = df.agg(count(lit(1)).as("nr"), fields.flatMap(aggsFor): _*)

    def entry(f: StructField): Column = {
      val mn = col(s"mn_${f.name}")
      val mx = col(s"mx_${f.name}")
      val (minNum, maxNum, minStr, maxStr) = f.dataType match {
        case ByteType | ShortType | IntegerType | LongType
           | DoubleType | FloatType | _: DecimalType =>
          (mn.cast("double"), mx.cast("double"),
            lit(null).cast("string"), lit(null).cast("string"))
        case TimestampType | TimestampNTZType | DateType =>
          (lit(null).cast("double"), lit(null).cast("double"),
            date_format(mn, "yyyy-MM-dd HH:mm:ss"),
            date_format(mx, "yyyy-MM-dd HH:mm:ss"))
        case _ =>
          (lit(null).cast("double"), lit(null).cast("double"),
            mn.cast("string"), mx.cast("string"))
      }
      struct(lit(f.name).as("col_name"),
        col("nr").as("n_rows"),
        (col("nr") - col(s"cnt_${f.name}")).as("n_nulls"),
        col(s"nd_${f.name}").as("n_distinct"),
        minNum.as("min_num"), maxNum.as("max_num"),
        minStr.as("min_str"), maxStr.as("max_str"))
    }
    aggd.select(explode(array(fields.map(entry): _*)).as("e"))
      .select(col("e.*"))
  }

  /** Schema/statistics drift between two snapshots of the "same" table
    * (q180's operator form) — the import-QC question an integration
    * tool asks after every load: did the new drop change shape? One
    * [[profile]] pass per side, FULL-OUTER-joined on column name, so a
    * column present on only one side surfaces as status
    * 'added'/'removed' instead of silently vanishing from the report.
    * Exact-integer drift surface: null rates as ppm (one truncating
    * div each — §5), distinct counts raw, and range_same = null-safe
    * equality of all four min/max slots (NULL, not false, on
    * added/removed rows — absence is not a range change). Cost: two
    * single-pass profiles + an answer-sized (one row per column) join. */
  def drift(a: DataFrame, b: DataFrame): DataFrame = {
    def side(df: DataFrame, s: String): DataFrame =
      profile(df).select(col("col_name"),
        col("n_rows").as(s"n_rows_$s"), col("n_nulls").as(s"n_nulls_$s"),
        col("n_distinct").as(s"n_distinct_$s"),
        col("min_num").as(s"min_num_$s"), col("max_num").as(s"max_num_$s"),
        col("min_str").as(s"min_str_$s"), col("max_str").as(s"max_str_$s"))
    val status = when(col("n_rows_b").isNull, lit("removed"))
      .when(col("n_rows_a").isNull, lit("added"))
      .otherwise(lit("ok"))
    side(a, "a").join(side(b, "b"), Seq("col_name"), "full_outer")
      .select(col("col_name"), status.as("status"),
        col("n_rows_a"), col("n_rows_b"),
        expr("n_nulls_a * 1000000L div n_rows_a").as("null_ppm_a"),
        expr("n_nulls_b * 1000000L div n_rows_b").as("null_ppm_b"),
        col("n_distinct_a"), col("n_distinct_b"),
        when(status === "ok",
          col("min_num_a") <=> col("min_num_b") &&
          col("max_num_a") <=> col("max_num_b") &&
          col("min_str_a") <=> col("min_str_b") &&
          col("max_str_a") <=> col("max_str_b")).as("range_same"))
  }

  /** Referential-integrity audit for one FK edge: ONE left equi-join +
    * conditional aggregation (parent keys must be unique — the join
    * never multiplies child rows; a separate anti-join pass + scalar
    * crossJoin would scan the child twice and plan a nested loop).
    * A NULL child key is NOT an orphan — NULL means "no reference",
    * which SQL's NOT IN / referential-integrity semantics never flag —
    * so nulls surface in their own n_null_keys column instead of
    * silently inflating (or, under NOT IN, deflating) the orphan count.
    * Returns one row:
    * (fk, n_child, n_null_keys, n_orphans, min_key, max_key). */
  def fkAudit(child: DataFrame, key: String, parent: DataFrame, pkey: String,
      label: String): DataFrame =
    child.join(parent.select(parent(pkey).as("__pk")),
        child(key) === col("__pk"), "left")
      .agg(count(lit(1)).as("n_child"),
        // sum over ZERO rows is NULL, not 0 — an empty child table must
        // still report 0 orphans
        coalesce(sum(when(child(key).isNull, 1L).otherwise(0L)), lit(0L))
          .as("n_null_keys"),
        coalesce(sum(when(child(key).isNotNull && col("__pk").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_orphans"),
        min(when(col("__pk").isNull, child(key))).as("min_key"),
        max(when(col("__pk").isNull, child(key))).as("max_key"))
      .select(lit(label).as("fk"), col("n_child"), col("n_null_keys"),
        col("n_orphans"), col("min_key"), col("max_key"))
}
