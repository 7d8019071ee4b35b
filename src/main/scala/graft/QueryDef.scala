package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation bound to the test tables
  * plus (when SQL-expressible) a DuckDB oracle over the same parquet files.
  *
  * Determinism protocol (see SURVEY.md §5): fractional aggregates go through
  * exact DECIMAL sums and are surfaced as doubles (bit-identical across
  * engines regardless of partial-aggregation order); averages/ratios are a
  * single double division of exact operands; timestamps are emitted as
  * formatted strings; every query ends in a deterministic ORDER BY.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
