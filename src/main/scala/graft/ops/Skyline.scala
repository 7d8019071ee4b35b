package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto frontier) — the rows no other row beats on both
  * axes (Börzsönyi ICDE'01): cheapest-for-their-recency orders,
  * shortest-for-their-quality documents, best price/date trade-offs.
  * A row r is DOMINATED iff some row s has s.x ≤ r.x ∧ s.y ≥ r.y with
  * at least one strict; the skyline is every non-dominated row (exact
  * ties on both axes all survive — none dominates the others).
  *
  * The 2-D structure collapses dominance to a PREFIX MAX: r is
  * dominated iff max{ s.y : s.x < r.x } ≥ r.y, or some same-x row has
  * a strictly larger y. The classic sequential algorithm is therefore
  * "sort by x, sweep a running max of y" — but a distributed operator
  * must not sort the corpus into one partition. Instead the prefix max
  * is computed hierarchically:
  *   1. band each row by x into `bands` equal-width buckets (min/max
  *      from one aggregate, broadcast — band assignment is INTERNAL:
  *      any self-consistent banding yields the same answer, so float
  *      banding math never needs cross-engine agreement);
  *   2. collapse to the (band, x) group level with the group's max y —
  *      one corpus shuffle, the only one;
  *   3. within each band, an ordered window over the collapsed groups
  *      gives the running max; `lag` shifts it to "strictly smaller x"
  *      (parallel per band — never a global window);
  *   4. an answer-sized band summary (`bands` rows) supplies the max y
  *      of all STRICTLY LOWER bands via a window over `bands` rows,
  *      broadcast back.
  * The prefix max for any row is then greatest(lower-bands max,
  * same-band strictly-smaller-x running max) — exact, with no global
  * sort and no all-pairs comparison. Comparisons never do cross-engine
  * arithmetic on the axes (doubles compare bit-identically as read), so
  * the output is hash-checkable against a NOT EXISTS dominance oracle.
  */
object Skyline {

  /** Skyline of `df` minimizing `xCol`, maximizing `yCol` (flip signs
    * at the call site for other orientations). Both axes must be
    * orderable and non-null. Returns the input rows that survive,
    * original columns intact. */
  def skyline2d(df: DataFrame, xCol: String, yCol: String,
      bands: Int = 64): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    val x = col(xCol).cast("double")
    val stats = df.agg(min(x).as("x_lo"), max(x).as("x_hi"))
    // equal-width banding; degenerate range (all x equal) → band 0
    val banded = df.crossJoin(broadcast(stats))
      .withColumn("__band",
        when(col("x_hi") === col("x_lo"), lit(0))
          .otherwise(least(lit(bands - 1),
            floor((x - col("x_lo")) / (col("x_hi") - col("x_lo")) * bands)
              .cast("int"))))
      .drop("x_lo", "x_hi")
    // collapse to (band, x) groups: the corpus shuffle
    val groups = banded.groupBy(col("__band"), col(xCol).as("__x"))
      .agg(max(col(yCol)).as("__gy"))
    // same-band prefix: running max over x-ordered groups, shifted to
    // exclude the current x (strictly-smaller-x semantics)
    val wRun = Window.partitionBy(col("__band")).orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy(col("__band")).orderBy(col("__x"))
    val withRun = groups
      .withColumn("__run", max(col("__gy")).over(wRun))
      .withColumn("__prev_in_band", lag(col("__run"), 1).over(wLag))
    // lower-bands prefix: `bands` rows, window over them is answer-sized
    val wBand = Window.orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bandMax = groups.groupBy(col("__band"))
      .agg(max(col("__gy")).as("__bmax"))
      .withColumn("__below", max(col("__bmax")).over(wBand))
      .select(col("__band"), col("__below"))
    // greatest() skips NULLs (it is null only when BOTH operands are),
    // so no -infinity sentinel is needed: __pref is null exactly when no
    // strictly-cheaper row exists anywhere
    val annotated = withRun.join(broadcast(bandMax), "__band")
      .select(col("__x"), col("__gy"),
        greatest(col("__prev_in_band"), col("__below")).as("__pref"))
    df.join(annotated, df(xCol) === annotated("__x"), "inner")
      .filter(
        // dominated by a strictly-cheaper row at least as good on y?
        (col("__pref").isNull || col("__pref") < col(yCol)) &&
        // dominated by a same-x row strictly better on y?
        col("__gy") <= col(yCol))
      .select(df.columns.map(df(_)): _*)
  }
}
