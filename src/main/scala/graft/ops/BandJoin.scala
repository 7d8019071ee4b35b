package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ε-band join — the numeric-DISTANCE join the equi/interval/as-of
  * family lacks: pairs with |v_a − v_b| ≤ ε within a group, WITHOUT a
  * cross product. bucket = floor(v/ε); one side probes {b−1, b, b+1}
  * (a ≤ε pair differs by ≤ 1 bucket — pigeonhole-complete), the join is
  * a plain equi-join on (group, bucket) + an exact residual filter, and
  * each unordered pair matches EXACTLY once (the probe hits the other
  * side's single home bucket — no dedup pass). floor(x/ε) and |a−b| are
  * single identical double op chains in any engine (no reorderable
  * accumulation → portable). See q169 for the oracle-gated face.
  */
object BandJoin {

  /** All unordered pairs (grp, id_a, id_b, v_a, v_b, diff) with
    * id_a < id_b and |v_a − v_b| ≤ eps within each group. */
  def pairs(df: DataFrame, idCol: String, grpCol: String, valCol: String,
      eps: Double): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val p = df.select(col(idCol).as("__id"), col(grpCol).as("grp"),
      col(valCol).as("__v"), floor(col(valCol) / eps).cast("long").as("__bkt"))
    val probe = p.select(col("__id").as("id_a"), col("grp"),
      col("__v").as("v_a"),
      explode(array(col("__bkt") - 1, col("__bkt"), col("__bkt") + 1)).as("__bkt"))
    val other = p.select(col("__id").as("id_b"), col("grp"),
      col("__v").as("v_b"), col("__bkt"))
    probe.join(other, Seq("grp", "__bkt"))
      .filter(col("id_a") < col("id_b") && abs(col("v_a") - col("v_b")) <= eps)
      .select(col("grp"), col("id_a"), col("id_b"), col("v_a"), col("v_b"),
        abs(col("v_a") - col("v_b")).as("diff"))
  }

  /** Per-group summary: pair count + the closest pair (order-free
    * min(struct) argmin, ties to the smaller ids). */
  def summary(df: DataFrame, idCol: String, grpCol: String, valCol: String,
      eps: Double): DataFrame =
    pairs(df, idCol, grpCol, valCol, eps)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_pairs"),
        min(struct(col("diff").as("d"), col("id_a").as("a"),
          col("id_b").as("b"))).as("c"))
      .select(col("grp"), col("n_pairs"), col("c.d").as("min_diff"),
        col("c.a").as("pair_a"), col("c.b").as("pair_b"))
}
