package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable, MERGEABLE sketches — the bounded-memory summaries a
  * 100 TB pipeline keeps where exact state would be corpus-sized, joining
  * the suite's existing sketch members (q88's Bloom pruning, q99's
  * Misra–Gries heavy hitters):
  *
  *   - HyperLogLog distinct counting (Flajolet et al. AofA'07): m = 2^p
  *     registers per group, register = max leading-zero rank of a 60-bit
  *     hash — the incremental-COUNT-DISTINCT story: per-partition (e.g.
  *     daily) register TABLES are tiny, persistable, and merge by
  *     register-wise MAX, so "distinct users this quarter" is a
  *     register merge, never a re-scan (the IncrementalAgg discipline
  *     extended to the one aggregate it cannot refresh exactly —
  *     COUNT(DISTINCT) is not differential, its sketch is).
  *   - Count-min frequency estimation (Cormode & Muthukrishnan '05):
  *     depth×width integer counters, point estimate = min over depth
  *     rows — always an OVERestimate, mergeable by counter-wise SUM.
  *
  * Portability discipline: hashes are the repo's md5-prefix convention
  * ([[Sampling.shard]]) so DuckDB rebuilds every register and counter
  * bit-for-bit; register ranks derive from `length(bin(q))` (identical
  * no-leading-zeros semantics in Spark and DuckDB, zero guarded); the
  * HLL estimate is a fixed-order double chain over an EXACT long
  * statistic S_u = Σ 2^(R−M_j) (every term a power of two, the sum
  * exact in long by construction), so even the float surface is
  * bit-identical cross-engine. No approximate aggregate from either
  * engine is used — the sketch IS the operator, auditable row by row.
  */
object Sketches {

  /** 60-bit md5-prefix hash of (salt, parts...) joined with ':' — the
    * [[Sampling.shard]] convention, rebuildable in any engine. */
  private[ops] def h60(salt: String, parts: Column*): Column =
    conv(substring(md5(concat_ws(":", (lit(salt) +: parts.map(_.cast("string"))): _*)),
      1, 15), 16, 10).cast("long")

  /** Max possible register rank for precision p: the hash keeps 60−p bits
    * after the register index, so ranks span [1, 61−p] (61−p = the
    * all-zero suffix). */
  private[ops] def maxRank(p: Int): Int = 61 - p

  /** HLL register table for `key` within each group: (groupCol, j, m_j)
    * with j ∈ [0, 2^p) and m_j ≥ 1 — registers never hit by a key are
    * ABSENT (m_j = 0 implicitly; [[hllSummary]] densifies). One
    * partial-aggregated shuffle on (group, j); output ≤ groups × 2^p
    * rows regardless of corpus size. */
  def hllRegisters(df: DataFrame, groupCol: String, key: Column,
      p: Int = 4, salt: String = "hll"): DataFrame = {
    require(p >= 1 && p <= 16, s"p must be in [1,16], got $p")
    val m = 1 << p
    val h = h60(salt, key)
    val q = shiftrightunsigned(h, p)
    val rank = when(q === 0, lit(maxRank(p)))
      .otherwise(lit(maxRank(p)) - length(bin(q)))
    df.select(col(groupCol), pmod(h, lit(m.toLong)).as("j"), rank.as("rank"))
      .groupBy(col(groupCol), col("j"))
      .agg(max(col("rank")).cast("int").as("m_j"))
  }

  /** Merge register tables by register-wise MAX — sketch(A ∪ B). Both
    * inputs must share (groupCol, j, m_j) and the same p/salt. This is
    * the operation that makes HLL state incremental: daily sketches
    * land as tiny tables, any period rolls up with one answer-sized
    * aggregate. */
  def hllMerge(a: DataFrame, b: DataFrame, groupCol: String): DataFrame =
    a.unionByName(b).groupBy(col(groupCol), col("j"))
      .agg(max(col("m_j")).as("m_j"))

  /** Collapse a register table to ONE group (relabeled `label`) by
    * register-wise max — the sketch of the union of all its groups. */
  def hllCollapse(regs: DataFrame, groupCol: String, label: String): DataFrame =
    regs.groupBy(col("j")).agg(max(col("m_j")).as("m_j"))
      .select(lit(label).as(groupCol), col("j"), col("m_j"))

  /** The standard bias constant α_m. */
  private[ops] def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Summarize a register table per group:
    * (group, regs = dense CSV of all 2^p registers in j order, v_zero =
    * untouched registers, s_u = Σ_j 2^(R − M_j) — the EXACT long
    * sufficient statistic (R = 61−p; empty registers contribute 2^R),
    * est = α_m·m²·2^R / s_u — the raw HLL estimate as ONE fixed-order
    * double chain over exact operands, bit-identical cross-engine).
    * The raw estimator is the honest surface at this scale; the
    * small-range (linear-counting) correction needs ln, whose last ulp
    * is engine-specific — callers needing it have v_zero. Per-group
    * state is 2^p collected entries — bounded by construction. */
  def hllSummary(regs: DataFrame, groupCol: String, p: Int = 4): DataFrame = {
    val m = 1 << p
    val r = maxRank(p)
    val dense = regs.groupBy(col(groupCol))
      .agg(map_from_entries(collect_list(struct(col("j"), col("m_j")))).as("e"))
      .select(col(groupCol),
        transform(sequence(lit(0L), lit(m - 1L)),
          jj => coalesce(element_at(col("e"), jj), lit(0))).as("d"))
    dense.select(col(groupCol),
        concat_ws(",", transform(col("d"), x => x.cast("string"))).as("regs"),
        aggregate(col("d"), lit(0),
          (acc, mj) => acc + when(mj === 0, 1).otherwise(0)).as("v_zero"),
        aggregate(col("d"), lit(0L),
          // 2^(R−M_j) via pow: exact — the exponent is an integer in
          // [0, R] so the double result is exactly representable and
          // the long cast lossless (the Scala shiftleft API cannot take
          // a column shift amount, and Column `/` is double division)
          (acc, mj) => acc + pow(lit(2.0), lit(r) - mj).cast("long"))
          .as("s_u"))
      .select(col(groupCol), col("regs"), col("v_zero"), col("s_u"),
        (lit(alpha(m)) * lit(m.toDouble * m) * lit(math.pow(2, r)) / col("s_u"))
          .as("est"))
  }

  // ---------------- KMV (bottom-k) distinct sketch ----------------

  /** Hash-space size of [[h60]]: 15 hex chars = 60 bits. Exactly
    * representable as a double (a power of two). */
  val KmvM: Double = 1152921504606846976.0d // 2^60

  /** The KMV key hash (public so streaming callers can pre-hash on the
    * stream side): 60-bit md5-prefix of (salt, key) — the [[h60]] /
    * [[Sampling.shard]] convention, rebuildable in any engine. */
  def kmvHash(key: Column, salt: String = "kmv"): Column = h60(salt, key)

  /** K-minimum-values sketch (Bar-Yossef et al. RANDOM'02; unbiased
    * estimator per Beyer et al. SIGMOD'07): per group, the k SMALLEST
    * distinct 60-bit key hashes, as rows (group, h, r) with r ∈ [1, k].
    * The third mergeable-sketch family member, and the one that buys what
    * HLL cannot: because a bottom-k set is a uniform SAMPLE of the
    * group's distinct keys, two groups' sketches support set
    * INTERSECTION / Jaccard estimates ([[kmvPairStats]] — the
    * theta-sketch trick), not just cardinality.
    *
    * Build shape: ONE partial-aggregated shuffle through the native
    * bounded bottom-k aggregate ([[org.apache.spark.sql.graft
    * .BottomKLongs]]) — each map task reduces its rows to ≤ k distinct
    * hashes per group before the exchange, so the shuffle carries
    * |tasks|×|groups|×k longs (r1–r10 shipped distinct + window
    * `row_number()`, which shuffled and single-task-sorted every distinct
    * hash in the corpus — the difference at 10^9 distinct keys is the
    * whole job). The sketch's 100 TB value is in what happens AFTER the
    * build — k rows per group persist, any partition layout merges by
    * [[kmvMerge]] in sketch-sized work, and every estimate downstream is
    * answer-sized. Deterministic by construction: the md5 hash order is a
    * total order, ties impossible among distinct hashes. */
  def kmvSketch(df: DataFrame, groupCol: String, key: Column,
      k: Int = 64, salt: String = "kmv"): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(col(groupCol))
      .agg(org.apache.spark.sql.graft.BottomKLongs(h60(salt, key), k).as("hs"))
      .select(col(groupCol), posexplode(col("hs")).as(Seq("p", "h")))
      .select(col(groupCol), col("h"), (col("p") + 1).cast("int").as("r"))
  }

  /** Merge two sketch tables built with the same (k, salt): bottom-k of
    * the union of hash sets — sketch(A ∪ B), the incremental-build
    * operation (daily sketches roll up without re-scanning). Sketch-sized
    * work: the bounded aggregate over 2×groups×k input rows. */
  def kmvMerge(a: DataFrame, b: DataFrame, groupCol: String, k: Int): DataFrame = {
    a.select(col(groupCol), col("h")).unionByName(b.select(col(groupCol), col("h")))
      .groupBy(col(groupCol))
      .agg(org.apache.spark.sql.graft.BottomKLongs(col("h"), k).as("hs"))
      .select(col(groupCol), posexplode(col("hs")).as(Seq("p", "h")))
      .select(col(groupCol), col("h"), (col("p") + 1).cast("int").as("r"))
  }

  /** Per-group cardinality estimate from a sketch table: sketches holding
    * fewer than k hashes saw ALL distinct keys (est = exact size);
    * saturated sketches use the unbiased (k−1)·M / h_(k) — one IEEE
    * division of exact operands ((k−1)·M is a small-int × power-of-two
    * product, exactly representable). */
  def kmvEstimate(sk: DataFrame, groupCol: String, k: Int): DataFrame =
    sk.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("int").as("sz"), max(col("h")).as("hk"))
      .select(col(groupCol), col("sz"), col("hk"),
        when(col("sz") < k, col("sz").cast("double"))
          .otherwise(lit((k - 1).toDouble * KmvM) / col("hk")).as("est"))

  /** All group-pair overlap estimates from ONE sketch table: for each
    * (grp_a < grp_b), the bottom-k of the two sketches' hash UNION is a
    * valid sketch of A ∪ B; the fraction ρ of its members present in
    * BOTH sketches estimates Jaccard, and ρ · est(A∪B) the intersection
    * cardinality (Beyer et al. SIGMOD'07 §5). Everything up to the final
    * divisions is exact integer arithmetic on array ops; jacc_est =
    * n_common/k (one exact-operand division), inter_est = jacc_est ·
    * ((k−1)·M / hk_u) (one more division then one product — fixed order,
    * engine-portable). Output is groupPairs × 1 rows — answer-sized; the
    * group-array collect is bounded by k per group. Saturation note: the
    * estimators assume saturated sketches (sz = k); callers with
    * sub-saturated groups have exact sets and don't need estimates.
    *
    * The group-pair join is deliberately a broadcast nested loop over
    * GROUP-count rows (k longs each) — bounded in-plan by `maxGroups`
    * with the jaccardTopK raise_error convention, loud instead of a
    * silent groups² blow-up when someone sketches a high-cardinality
    * group key. */
  def kmvPairStats(sk: DataFrame, groupCol: String, k: Int,
      maxGroups: Int = 1024): DataFrame = {
    require(maxGroups >= 2, s"maxGroups must be >= 2, got $maxGroups")
    val arr = sk.groupBy(col(groupCol))
      .agg(sort_array(collect_list(col("h"))).as("hs"))
    val ng = count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy())
    val a = broadcast(arr
      .withColumn("__ng", ng)
      .select(
        when(col("__ng") > maxGroups,
          raise_error(lit(s"kmvPairStats: group count exceeds maxGroups=" +
            s"$maxGroups — the pair join is a deliberate groups x groups " +
            "nested loop; aggregate the group key or raise the bound")))
          .otherwise(col(groupCol)).as("grp_a"),
        col("hs").as("hs_a")))
    val b = arr.select(col(groupCol).as("grp_b"), col("hs").as("hs_b"))
    a.join(b, col("grp_a") < col("grp_b"))
      .select(col("grp_a"), col("grp_b"),
        slice(sort_array(array_union(col("hs_a"), col("hs_b"))), 1, k).as("u"),
        col("hs_a"), col("hs_b"))
      .select(col("grp_a"), col("grp_b"),
        size(array_intersect(col("u"), array_intersect(col("hs_a"), col("hs_b"))))
          .cast("int").as("n_common"),
        element_at(col("u"), least(lit(k), size(col("u")))).as("hk_u"))
      .select(col("grp_a"), col("grp_b"), col("n_common"),
        (col("n_common").cast("double") / lit(k.toDouble)).as("jacc_est"),
        ((col("n_common").cast("double") / lit(k.toDouble)) *
          (lit((k - 1).toDouble * KmvM) / col("hk_u"))).as("inter_est"))
  }

  /** Count-min counter table over weighted keys: (i, bucket, c) with
    * i ∈ [0, depth), bucket ∈ [0, width), c = Σ weight of keys hashing
    * there under row i's salt. One generator explode (depth rows per
    * input) into a partial-aggregated groupBy — the only shuffle carries
    * ≤ tasks × depth × width partial sums; the table is depth×width
    * rows at ANY corpus size, and two tables over disjoint corpora merge
    * by counter-wise addition. */
  def cmsCounters(df: DataFrame, key: Column, weight: Column,
      depth: Int = 4, width: Int = 32, salt: String = "cms"): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad cms dims d=$depth w=$width")
    df.select(key.as("__k"), weight.as("__w"))
      .select(col("__k"), col("__w"),
        explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .select(col("i"),
        pmod(h60(salt, col("i"), col("__k")), lit(width.toLong)).as("bucket"),
        col("__w"))
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("__w")).as("c"))
  }

  /** BOTH sides' counter tables from ONE scan — for the join-size-
    * under-predicate question (q170), where A and B are the same source
    * under different weight conditions: (i, bucket, ca, cb) with
    * ca = Σ wa, cb = Σ wb. Same hash rows as two [[cmsCounters]] calls
    * (a key hashes identically on both sides), so downstream estimates
    * are bit-identical — but it halves the source scans AND removes the
    * counter equi-join from the inner product (the per-bucket a·b
    * product reads from one row; a bucket missing from the filtered
    * side carries cb = 0 and contributes 0, exactly as the join's
    * absent row did). One scan, one partial-aggregated shuffle. */
  def cmsCountersPair(df: DataFrame, key: Column, wa: Column, wb: Column,
      depth: Int = 4, width: Int = 32, salt: String = "cms"): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad cms dims d=$depth w=$width")
    df.select(key.as("__k"), wa.as("__wa"), wb.as("__wb"))
      .select(col("__k"), col("__wa"), col("__wb"),
        explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .select(col("i"),
        pmod(h60(salt, col("i"), col("__k")), lit(width.toLong)).as("bucket"),
        col("__wa"), col("__wb"))
      .groupBy(col("i"), col("bucket"))
      .agg(sum(col("__wa")).as("ca"), sum(col("__wb")).as("cb"))
  }

  /** Point estimates for `probes` (a small key batch) against a counter
    * table: est = min over depth rows of the key's bucket counter —
    * ≥ the true count always (collisions only add). The probe side
    * explodes to probes×depth rows and joins the depth×width counter
    * table — answer-sized at any scale. */
  def cmsEstimate(counters: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 32, salt: String = "cms"): DataFrame = {
    val pr = probes.select(col(keyCol),
        explode(sequence(lit(0), lit(depth - 1))).as("i"))
      .select(col(keyCol), col("i"),
        pmod(h60(salt, col("i"), col(keyCol)), lit(width.toLong)).as("bucket"))
    pr.join(counters, Seq("i", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("c"), lit(0L))).as("est_n"))
  }

  /** Join-size estimation WITHOUT joining (Cormode & Muthukrishnan '05
    * §4.2, the inner-product estimate): |A ⋈_k B| = Σ_k f_A(k)·f_B(k),
    * estimated per depth row as Σ_bucket a[i][w]·b[i][w] and taken as
    * the MIN over depths — always an OVERestimate (collisions only add
    * non-negative cross terms). This is the query-planner composition
    * the sketch family exists for at 100 TB: both counter tables are
    * depth×width rows regardless of corpus size, maintained
    * incrementally by counter-wise SUM, so "how big would this join
    * be?" costs an answer-sized multiply — never the join. Returns one
    * row per depth (i, est) — exact DECIMAL products (counter pairs
    * overflow long at corpus scale); callers min() the answer-sized
    * result. Both inputs must share (depth, width, salt). */
  def cmsJoinSizeByDepth(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("i"), col("bucket"), col("c").cast("decimal(19,0)").as("ca"))
      .join(b.select(col("i"), col("bucket"), col("c").cast("decimal(18,0)").as("cb")),
        Seq("i", "bucket"))
      .groupBy(col("i"))
      .agg(sum(col("ca") * col("cb")).cast("decimal(38,0)").as("est"))

  // ---------------- DD-style quantile histogram ----------------

  /** Log-bucketed quantile histogram — the QUANTILE member of the
    * mergeable-sketch family (distinct = HLL, frequency = count-min,
    * overlap = KMV, membership = Bloom; ranks were missing). The
    * DDSketch idea (Masson VLDB'19) with a base-2, INTEGER-EXACT
    * bucketing both engines share bit-for-bit: a positive integer
    * value floors to its top `sig` significant binary digits
    * (shift = max(bitlen(v) − sig, 0); lo = (v ⌊/⌋ 2^shift) · 2^shift),
    * so bucket bounds are pure integer arithmetic — no log(), no
    * floats, no engine-specific quantile aggregate. Relative bucket
    * width ≤ 2^−(sig−1), i.e. any quantile estimate's lower bound is
    * within that relative error of the true order statistic.
    *
    * Scale/mergeability: the histogram is ≤ groups × 2^(sig−1) ×
    * bitlen(max) rows at ANY corpus size (one partial-aggregated
    * shuffle); per-partition histograms merge by bucket-wise SUM
    * ([[ddCollapse]] demonstrates the merge as the '__all' rollup —
    * the q128 discipline), so "p99 latency this quarter" is a
    * bucket-table merge, never a re-sort of the quarter. */
  def ddBuckets(df: DataFrame, groupCol: String, value: Column,
      sig: Int = 4): DataFrame = {
    require(sig >= 2 && sig <= 16, s"sig must be in [2,16], got $sig")
    val v = value.cast("long")
    // guard: the bucketing is defined on positive integers; 2^shift via
    // pow() is exact only while shift < 53 (values below 2^56 with
    // sig=4) — both violations fail loudly, never bucket wrong
    val checked = when(v <= 0, raise_error(lit(
        "ddBuckets: values must be positive integers")))
      .when(v >= (1L << 56), raise_error(lit(
        "ddBuckets: value >= 2^56 — rescale units before sketching")))
      .otherwise(v)
    val shift = greatest(length(bin(checked)) - lit(sig), lit(0))
    // 2^shift exact: shift ≤ 56−sig ≤ 52 under the guard; the floor is
    // subtraction of an exact integer mod — no division anywhere
    val p = pow(lit(2.0), shift).cast("long")
    df.select(col(groupCol), (checked - pmod(checked, p)).as("lo"), p.as("__p"))
      .select(col(groupCol), col("lo"), (col("lo") + col("__p")).as("hi"))
      .groupBy(col(groupCol), col("lo"), col("hi"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Bucket-wise SUM of a histogram table into one labelled row group —
    * the merge operation (and the cross-group rollup when label =
    * '__all'). */
  def ddCollapse(buckets: DataFrame, groupCol: String, label: String): DataFrame =
    buckets.groupBy(col("lo"), col("hi"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(lit(label).as(groupCol), col("lo"), col("hi"), col("cnt"))

  /** Quantile estimates from a histogram table: for each permille target
    * q‰, the lower bound of the first bucket whose cumulative count
    * reaches ⌈q·n/1000⌉ — all-integer (cum·1000 ≥ q·n avoids the
    * division entirely). The window and join run over the answer-sized
    * bucket table, never the data. Returns (groupCol, q, n, est). */
  def ddQuantiles(buckets: DataFrame, groupCol: String,
      qs: Seq[Int]): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 1 && q <= 1000),
      s"quantile targets must be permille values in [1,1000], got $qs")
    // cum and n are two window aggregates over the SAME partition key —
    // one shuffle of the bucket table, no self-join (which would also
    // trip attribute-conflict resolution on streaming memory sinks)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("lo"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    val cum = buckets
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(wAll))
    val spark = buckets.sparkSession
    import spark.implicits._
    val targets = qs.toDF("q")
    cum.crossJoin(broadcast(targets))
      .filter(col("cum") * 1000 >= col("q") * col("n"))
      .groupBy(col(groupCol), col("q"), col("n"))
      .agg(min(col("lo")).as("est"))
  }
}
