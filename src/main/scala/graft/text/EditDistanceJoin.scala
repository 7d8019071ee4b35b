package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Partition-based edit-distance similarity self-join (the PassJoin
  * scheme, Li/Deng/Feng/Wang VLDB'12) — the string-matching half of
  * record linkage, which the reference's import+keyed-update workflow
  * (SQL_DATA_INTEGRATION_TOOL.py 241-312) leaves to exact keys.
  *
  * The problem with a naive fuzzy join is that it is a cross join with
  * a `levenshtein(a,b) <= k` residual — O(n²) comparisons, a
  * BroadcastNestedLoopJoin at any scale. PassJoin turns it into an
  * equi-join by the pigeonhole principle: split every string into k+1
  * contiguous segments; at most k edit operations can touch at most k
  * segments, so any string within distance k contains at least one
  * segment VERBATIM as a substring, displaced by at most k positions.
  *
  *  - Index side: each string of length l emits its k+1 segments keyed
  *    by (l, segment-ordinal, segment-text).
  *  - Probe side: each string t enumerates, for every candidate partner
  *    length l in [|t|-k, |t|+k] and every segment ordinal i, the
  *    substrings of t with the l-partition's segment length at start
  *    positions within ±k of the segment's home position — a constant
  *    ≤ (2k+1)²(k+1) emissions per row.
  *  - Candidates = equi-join on (l, i, segment); exact verify with the
  *    codegen'd `levenshtein` clears pigeonhole false positives.
  *
  * Everything is built from `sequence`/`explode`/`substring` column
  * expressions — no UDF, whole-stage codegen end to end, and the join
  * is a plain shuffled equi-join: shuffle volume is linear in rows ×
  * the constant fan-out, never quadratic. Bucket sizes are bounded by
  * segment-value collision counts (rare segments, by the same argument
  * that makes prefix filtering work in [[graft.dedup.Dedup.jaccardJoin]]).
  *
  * Both orientations of every qualifying pair surface (distance is
  * symmetric, both sides index and probe), so restricting the join to
  * `id_a < id_b` keeps exactly one canonical orientation with no
  * completeness loss.
  *
  * Returns (id_a, id_b, dist) with id_a < id_b and dist <= k. Rows with
  * NULL or empty strings are ignored (no edit-distance semantics for
  * missing values); ids must be unique per string.
  */
object EditDistanceJoin {

  def selfJoin(df: DataFrame, idCol: String, strCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val s = df.sparkSession
    import s.implicits._

    val base = df
      .select(col(idCol).as("id"), col(strCol).as("str"))
      .filter($"str".isNotNull && length($"str") >= 1)
      .withColumn("len", length($"str"))

    // Segment arithmetic for the canonical even partition of a length-l
    // string into k+1 pieces: the first (l mod (k+1)) segments get the
    // extra character. seg i covers [start, start+segLen).
    def segLen(l: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (l / (k + 1)).cast("int") + when(i < l % (k + 1), 1).otherwise(0)
    def segStart(l: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      (i * (l / (k + 1)).cast("int")) + least(i, l % (k + 1))

    val idx = base
      .select($"id", $"str", $"len", explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("segLen", segLen($"len", $"i"))
      .withColumn("segStart", segStart($"len", $"i"))
      .select($"id".as("id_a"), $"str".as("str_a"), $"len".as("l"), $"i",
        substring_index_free($"str", $"segStart", $"segLen").as("seg"))

    val prb = base
      .select($"id", $"str", $"len",
        explode(sequence(greatest(lit(1), $"len" - k), $"len" + k)).as("l"))
      .select($"id", $"str", $"len", $"l", explode(sequence(lit(0), lit(k))).as("i"))
      .withColumn("segLen", segLen($"l", $"i"))
      .withColumn("segStart", segStart($"l", $"i"))
      .withColumn("lo", greatest(lit(0), $"segStart" - k))
      .withColumn("hi", least($"len" - $"segLen", $"segStart" + k))
      .filter($"hi" >= $"lo")
      .select($"id", $"str", $"l", $"i", $"segLen",
        explode(sequence($"lo", $"hi")).as("pos"))
      .select($"id".as("id_b"), $"str".as("str_b"), $"l", $"i",
        substring_index_free($"str", $"pos", $"segLen").as("seg"))

    idx
      .join(prb, idx("l") === prb("l") && idx("i") === prb("i") &&
        idx("seg") === prb("seg") && $"id_a" < $"id_b")
      .select($"id_a", $"id_b", $"str_a", $"str_b")
      .distinct()
      .withColumn("dist", levenshtein($"str_a", $"str_b"))
      .filter($"dist" <= k)
      .select($"id_a", $"id_b", $"dist")
  }

  /** substring with 0-based column start/length (Spark's `substring`
    * builtin takes literal ints only; `expr` form takes columns). */
  private def substring_index_free(str: org.apache.spark.sql.Column,
      start0: org.apache.spark.sql.Column,
      len: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    str.substr(start0 + 1, len)
}
