package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One source→target column mapping rule: select `src`, rename to `dst`,
  * optionally cast and transform. Mirrors the reference's Excel→SQL column
  * mapping workflow (SQL_DATA_INTEGRATION_TOOL.py:579-614 `populate_import_
  * column_mapping` / 628-671 `insert_data_to_sql`), where unmapped columns
  * are "Do not import" and nulls are normalized before insert.
  */
final case class ColumnSpec(
    src: String,
    dst: String,
    castTo: Option[String] = None,
    transform: Option[Column => Column] = None)

/** Declarative column-mapped ingest. The whole mapping compiles to a single
  * `select` of aliased/cast expressions, so Catalyst prunes unmapped columns
  * at the scan (ReadSchema only contains mapped sources) — at 100 TB the
  * unreferenced columns are never read off disk. The reference's row-by-row
  * `cursor.execute(INSERT ...)` loop (ref 241-267) becomes a distributed
  * append write with no driver-side iteration.
  */
object MappedImport {

  /** Apply the mapping: subset + rename + cast + optional per-column
    * transform + blank→null normalization on string columns (the analog of
    * the reference's `pd.isnull(value) → None`, ref 645-650). */
  def apply(df: DataFrame, specs: Seq[ColumnSpec], nullifyBlank: Boolean = true): DataFrame = {
    val cols = specs.map { s =>
      var c: Column = col(s.src)
      s.transform.foreach(f => c = f(c))
      s.castTo.foreach(t => c = c.cast(t))
      if (nullifyBlank) {
        val isStr = df.schema.find(_.name == s.src).exists(_.dataType.typeName == "string") &&
          s.castTo.forall(_ == "string")
        if (isStr && s.transform.isEmpty) c = nullif(trim(c), lit(""))
      }
      c.as(s.dst)
    }
    df.select(cols: _*)
  }

  /** The "Insert Data" action: distributed append into a parquet table. */
  def appendTo(df: DataFrame, targetPath: String): Unit =
    df.write.mode("append").parquet(targetPath)
}
