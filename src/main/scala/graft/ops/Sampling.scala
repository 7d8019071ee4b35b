package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling/sharding for training-data
  * pipelines. Spark's `sample()`/`randomSplit()` depend on seed AND
  * partitioning, so the selected rows change under repartition or engine
  * migration; a reproducible train/val/test split (and an auditable "which
  * 10% did we train on?") needs a pure function of the row key. The shard
  * is the first 60 bits of md5("salt:key") mod buckets — any engine with
  * md5 (DuckDB, Trino, Python, ...) selects byte-identical rows. At 100 TB
  * this is one codegen'd projection: no shuffle, no state, prunes with the
  * scan when the shard predicate is pushed down.
  */
object Sampling {

  /** Stable shard id in [0, buckets) for a row key. Change `salt` to draw
    * an independent split from the same keys. */
  def shard(key: Column, buckets: Int, salt: String = "shard"): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(salt), key.cast("string"))), 1, 15),
      16, 10).cast("long"), lit(buckets.toLong))

  /** Keep rows whose shard falls below `pct` of `buckets` — a deterministic
    * `pct/buckets` sample. */
  def sampleByHash(key: Column, pct: Int, buckets: Int = 100,
      salt: String = "shard"): Column =
    shard(key, buckets, salt) < pct

  /** Deterministic seeded corpus shuffle (q181's operator form): the
    * epoch-order pass every training run needs — a fresh but
    * REPRODUCIBLE global order per seed, emitted as (id, shard, pos).
    * shard = md5 shard of the id under the seed (each training worker
    * reads one shard); pos = the row's rank within its shard under an
    * INDEPENDENT md5 draw (different salt prefix, so shard membership
    * and within-shard order are uncorrelated), 60-bit-collision ties
    * broken by id.
    *
    * NO global sort: `ORDER BY rand()` would range-partition the whole
    * corpus through one skew-prone exchange; here the only per-row work
    * is two md5s, the single shuffle is the hash partition by shard,
    * and each rank window sorts ONE shard — corpus/nShards rows, with
    * nShards the knob that keeps a shard a file-sized unit at any
    * corpus scale. Any engine (or a resumed job) re-derives the exact
    * same order from (seed, id) alone — no persisted RNG state. */
  def corpusShuffle(df: DataFrame, idCol: String, seed: String,
      nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val pos = conv(substring(md5(concat_ws(":", lit(s"pos:$seed"),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    df.select(col(idCol), shard(col(idCol), nShards, s"ep:$seed").as("shard"),
        pos.as("__r"))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("shard"))
          .orderBy(col("__r"), col(idCol))).cast("long"))
      .drop("__r")
  }

  /** Weight-proportional SYSTEMATIC sampling: one row selected per full
    * `step` units of cumulative weight, walking the rows in a
    * deterministic md5 order — the curation pass that downsamples a
    * corpus to a byte/token budget while keeping inclusion probability
    * ∝ weight (w/step for w < step; rows with w ≥ step are always kept,
    * once). Versus [[sampleByHash]] this weights by the row's SIZE, and
    * versus independent Bernoulli draws the systematic walk pins the
    * sample's total weight to totalW/step ± 1 per stratum — the
    * controlled-budget property curation actually needs.
    *
    * Scale shape: a single global cumulative sum would serialize into
    * one partition, so rows first hash into `buckets` md5 strata and the
    * running sum is a per-stratum window — buckets-wide parallelism,
    * deterministic because stratum AND order derive from the same 60-bit
    * key hash (each stratum's walk restarts at phase 0, a boundary
    * effect of ≤ 1 selection per stratum). All arithmetic is integer
    * (long cumsum, truncating DIV), so any engine replays the identical
    * selection. Weights must be positive. */
  def systematicWeighted(df: DataFrame, idCol: String, weightCol: String,
      step: Long, buckets: Int = 64, salt: String = "syssamp"): DataFrame = {
    require(step >= 1, s"step must be >= 1, got $step")
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val h = conv(substring(md5(concat_ws(":", lit(salt),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col("__bucket")).orderBy(col("__h"), col(idCol))
    df.withColumn("__h", h)
      .withColumn("__bucket", pmod(col("__h"), lit(buckets.toLong)))
      .withColumn("__cw", sum(col(weightCol).cast("long")).over(w))
      .filter(expr(s"__cw DIV $step") >
        expr(s"(__cw - CAST($weightCol AS BIGINT)) DIV $step"))
      .drop("__h", "__bucket", "__cw")
  }

  /** Temperature-balanced group sampling — the multilingual training-mix
    * operator (mT5, Raffel et al. JMLR'20 §3.4.3; XLM-R, Conneau et al.
    * ACL'20 §3): drawing a corpus budget proportionally to group size
    * starves tail languages/domains, uniformly overfits them; the
    * standard fix samples group l with probability ∝ n_l^α (α = 1/2
    * here — the geometric midpoint both papers land near), UPsampling
    * the tail relative to its share and DOWNsampling the head.
    *
    * Exact-integer contract (the §5 portability discipline): weights are
    * w_l = ⌊√n_l⌋ — `sqrt` is IEEE-754 correctly rounded in every engine
    * and n_l < 2^52, so the floor is the true integer square root —
    * targets t_l = min(n_l, budget·w_l ⌊/⌋ Σw) in pure long arithmetic,
    * and the selection is the t_l rows of each group with the SMALLEST
    * md5 key hash (a total order, no ties) — so two engines, or two runs
    * over different partitionings, pick byte-identical rows and EXACT
    * per-group counts, which is what a training-mix spec audits.
    *
    * Scale shape: group sizes are one answer-sized aggregate broadcast
    * back; selection is one per-group rank (a sort shuffle partitioned
    * by the group — the price of exact counts; a budget too large to
    * sort per-group trades exactness for [[systematicWeighted]]'s
    * stratified walk). Returns (groupCol, idCol, n_grp, t_grp) for the
    * selected rows. */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      budget: Column, salt: String = "temp"): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_grp"))
      .withColumn("w_l", floor(sqrt(col("n_grp"))).cast("long"))
    allocSample(df, groupCol, idCol, counts, budget, salt)
  }

  /** Neyman-allocated stratified sampling (Neyman 1934; the survey-
    * sampling optimum): a fixed budget split ∝ N_h·σ_h — a large
    * HOMOGENEOUS stratum needs few rows (its mean is already pinned);
    * a small VOLATILE one needs many. The complement of
    * [[temperatureSample]] (which weighs by size alone): here the
    * weight is w_h = max(1, ⌊√(N_h·Q_h − S_h²)⌋) over EXACT integer
    * moments of `valueMicros` (N·Q − S² = N²·Var, so √ of it is
    * N_h·σ_h) — decimal-exact inside, ONE double sqrt of an exactly-
    * represented integer (IEEE correctly rounded → the floor is
    * portable); max(1,·) keeps Σw positive (an all-constant corpus
    * would otherwise divide by zero) — a zero-variance stratum can
    * still be ALLOCATED 0 rows, which is Neyman's actual answer
    * (its mean is pinned), stated rather than papered over.
    * Selection = the t_h smallest md5 key hashes per group (byte-
    * identical rows + exact counts across engines/partitionings, the
    * q154 contract). Headroom: N·Q − S² must fit decimal(38,0) —
    * ≲ 1e38, i.e. micro-unit values to ~1e12 at a billion rows per
    * stratum, stated. Returns (groupCol, idCol, n_grp, t_grp). */
  def neymanSample(df: DataFrame, groupCol: String, idCol: String,
      valueMicros: Column, budget: Column, salt: String = "neyman"): DataFrame = {
    val counts = df
      .select(col(groupCol), valueMicros.as("__m"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_grp"),
        sum(col("__m").cast("decimal(19,0)")).as("__s"),
        sum(col("__m").cast("decimal(19,0)") * col("__m").cast("decimal(18,0)"))
          .as("__q"))
      .select(col(groupCol), col("n_grp"),
        greatest(lit(1L),
          floor(sqrt((col("n_grp").cast("decimal(18,0)") * col("__q")
            - col("__s") * col("__s")).cast("decimal(38,0)").cast("double")))
            .cast("long")).as("w_l"))
    allocSample(df, groupCol, idCol, counts, budget, salt)
  }

  /** Shared allocation core: given per-group weights (groupCol, n_grp,
    * w_l), targets t_h = min(n_h, budget·w_h ⌊/⌋ Σw) in pure long
    * arithmetic, then each group's t_h smallest md5 key hashes. */
  private def allocSample(df: DataFrame, groupCol: String, idCol: String,
      counts: DataFrame, budget: Column, salt: String): DataFrame = {
    val sw = counts.agg(sum(col("w_l")).as("sw"))
    val targets = counts.crossJoin(broadcast(sw))
      .withColumn("__bw", (budget.cast("long") * col("w_l")))
      // truncating long division (DIV) — never the double `/`
      .select(col(groupCol), col("n_grp"),
        least(col("n_grp"), expr("__bw DIV sw")).as("t_grp"))
    val h = conv(substring(md5(concat_ws(":", lit(salt),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__h"))
    df.select(col(groupCol), col(idCol))
      .withColumn("__h", h)
      .withColumn("__r", row_number().over(w))
      .join(broadcast(targets), Seq(groupCol))
      .filter(col("__r") <= col("t_grp"))
      .select(col(groupCol), col(idCol), col("n_grp"), col("t_grp"))
  }
}
