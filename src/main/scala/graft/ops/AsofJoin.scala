package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — the time-series join Spark lacks as a built-in: for each
  * left row, attach the payload of the LATEST right row with the same key
  * and `right.ts <= left.ts` (inclusive).
  *
  * Implementation is the merge-join formulation, not a range join: both
  * sides union into one stream, shuffle ONCE on the key, sort within
  * partitions by (ts, side) — right rows sort before left rows at equal
  * ts, making the match inclusive — and a running `last(ignoreNulls)`
  * window carries the most recent right payload forward onto every left
  * row. Cost is sort-of(|L|+|R|) within key partitions: no range
  * explosion, no per-key collect, no BroadcastNestedLoopJoin; AQE skew
  * handling applies to the single exchange like any other shuffle.
  *
  * The payload travels as ONE struct column (null marks a left row), so
  * genuinely-null fields inside a right payload are preserved rather than
  * skipped by ignoreNulls. Right rows should be unique per (key, ts) —
  * dedupe upstream — or the winner among equal timestamps is
  * nondeterministic.
  */
object AsofJoin {

  /** Left rows + `payload` columns of the latest right row at or before
    * the left timestamp (null columns when no right row precedes).
    * Output payload columns are named `prefix + name`. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightStruct = struct((ts +: payload).distinct.map(col): _*)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(
        right.select(rightStruct).schema.head.dataType))
    val r = right.select(col(key), col(ts).as("__rts"), rightStruct.as("__p"))
      .select(col(key), col("__rts").as(ts), lit(0).as("__side"), col("__p"))
    // align schemas: right side carries nulls for the left-only columns
    val rAligned = leftCols.filterNot(c => c == key || c == ts)
      .foldLeft(r) { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned.select((leftCols.map(col) :+ col("__side") :+ col("__p")): _*))
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        payload.filterNot(_ == ts).map(c => col("__match." + c).as(prefix + c)) :+
        col("__match." + ts).as(prefix + ts)): _*)
  }
}
