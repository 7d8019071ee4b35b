package graft

import org.apache.spark.sql.functions._
import graft.ops.Sketches

/** Component contracts for the mergeable sketches (ops/Sketches.scala):
  * the algebraic properties the q128/q129 oracle rows cannot see —
  * merge/collapse identities across independently-built sketches, the
  * count-min overestimate direction, and estimate accuracy at a
  * precision the tiny oracle corpus can't exercise. */
class SketchesSpec extends SparkSpec {

  private def keyed(n: Int, tag: String) = {
    import spark.implicits._
    (0 until n).map(i => (s"$tag$i", "g")).toDF("k", "grp")
  }

  test("HLL: merge of split sketches equals the sketch of the union, register for register") {
    import spark.implicits._
    val all = keyed(3000, "u")
    val a = all.filter(xxhash64($"k") % 2 === 0)
    val b = all.filter(xxhash64($"k") % 2 =!= 0)
    val direct = Sketches.hllRegisters(all, "grp", $"k", p = 6)
    val merged = Sketches.hllMerge(
      Sketches.hllRegisters(a, "grp", $"k", p = 6),
      Sketches.hllRegisters(b, "grp", $"k", p = 6), "grp")
    assert(direct.orderBy("grp", "j").collect().toSeq ==
      merged.orderBy("grp", "j").collect().toSeq)
  }

  test("HLL: duplicate arrivals never move a register (distinct-ness)") {
    import spark.implicits._
    val once = keyed(500, "d")
    val thrice = once.unionByName(once).unionByName(once)
    assert(Sketches.hllRegisters(once, "grp", $"k", p = 5)
      .orderBy("j").collect().toSeq ==
      Sketches.hllRegisters(thrice, "grp", $"k", p = 5)
        .orderBy("j").collect().toSeq)
  }

  test("HLL: summary densifies to 2^p registers and the estimate lands within 3 standard errors") {
    import spark.implicits._
    val n = 20000
    val p = 8 // rse ≈ 1.04/√256 ≈ 6.5%
    val sk = Sketches.hllSummary(
      Sketches.hllRegisters(keyed(n, "x"), "grp", $"k", p = p), "grp", p = p)
    val row = sk.head()
    assert(row.getAs[String]("regs").split(",").length == (1 << p))
    val est = row.getAs[Double]("est")
    assert(math.abs(est - n) / n < 3 * 1.04 / math.sqrt(1 << p),
      s"est=$est for n=$n out of tolerance")
    // sufficient statistic consistency: v_zero counts the registers the
    // CSV shows as zero
    assert(row.getAs[Int]("v_zero") ==
      row.getAs[String]("regs").split(",").count(_ == "0"))
  }

  test("HLL: collapse over groups equals the sketch of the pooled keys") {
    import spark.implicits._
    val df = (0 until 2000).map(i => (s"k$i", s"g${i % 3}")).toDF("k", "grp")
    val pooled = df.withColumn("grp", lit("__all"))
    val collapsed = Sketches.hllCollapse(
      Sketches.hllRegisters(df, "grp", $"k", p = 6), "grp", "__all")
    val direct = Sketches.hllRegisters(pooled, "grp", $"k", p = 6)
    assert(collapsed.orderBy("j").collect().toSeq ==
      direct.orderBy("j").collect().toSeq)
  }

  test("count-min: estimates dominate true counts and split sketches merge by addition") {
    import spark.implicits._
    // Zipf-ish weighted keys
    val rows = (0 until 400).flatMap(i => Seq.fill(1 + 400 / (i + 1))(s"t$i"))
    val df = rows.toDF("k")
    val counters = Sketches.cmsCounters(df, $"k", lit(1L), depth = 4, width = 64)
    val truth = df.groupBy($"k").agg(count(lit(1)).as("true_n"))
    val est = Sketches.cmsEstimate(counters, truth.select($"k"), "k",
      depth = 4, width = 64)
    val joined = truth.join(est, "k").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("est_n") >= r.getAs[Long]("true_n"),
        s"CMS underestimated ${r.getAs[String]("k")}")
    }
    // merge = counter-wise addition across disjoint shards
    val a = df.filter(xxhash64($"k") % 2 === 0)
    val b = df.filter(xxhash64($"k") % 2 =!= 0)
    val merged = Sketches.cmsCounters(a, $"k", lit(1L), depth = 4, width = 64)
      .unionByName(Sketches.cmsCounters(b, $"k", lit(1L), depth = 4, width = 64))
      .groupBy("i", "bucket").agg(sum("c").as("c"))
    assert(counters.orderBy("i", "bucket").collect().toSeq ==
      merged.orderBy("i", "bucket").collect().toSeq)
  }

  test("count-min: a probe absent from the corpus estimates only its collision mass") {
    import spark.implicits._
    val df = (0 until 50).map(i => s"present$i").toDF("k")
    val counters = Sketches.cmsCounters(df, $"k", lit(1L), depth = 4, width = 1024)
    val ghost = Seq("never-seen-key").toDF("k")
    val est = Sketches.cmsEstimate(counters, ghost, "k", depth = 4, width = 1024)
      .head().getAs[Long]("est_n")
    // width ≫ keys: with 4 independent rows the min bucket is almost
    // surely untouched; allow tiny collision mass but never the corpus
    assert(est <= 2, s"ghost key estimated $est")
  }

  test("KMV: merge of split sketches equals the sketch of the union, hash for hash") {
    import spark.implicits._
    val all = keyed(5000, "m")
    val a = all.filter(xxhash64($"k") % 2 === 0)
    val b = all.filter(xxhash64($"k") % 2 =!= 0)
    val direct = Sketches.kmvSketch(all, "grp", $"k", k = 64)
    val merged = Sketches.kmvMerge(
      Sketches.kmvSketch(a, "grp", $"k", k = 64),
      Sketches.kmvSketch(b, "grp", $"k", k = 64), "grp", 64)
    assert(direct.orderBy("grp", "r").collect().toSeq ==
      merged.orderBy("grp", "r").collect().toSeq)
  }

  test("KMV: sub-saturated sketch reports the exact count; saturated estimate within 3 rse") {
    import spark.implicits._
    val small = Sketches.kmvEstimate(
      Sketches.kmvSketch(keyed(40, "s"), "grp", $"k", k = 64), "grp", 64).head()
    assert(small.getAs[Int]("sz") == 40 && small.getAs[Double]("est") == 40.0)
    val n = 30000
    val k = 256 // rse ≈ 1/√(k−2) ≈ 6.3%
    val big = Sketches.kmvEstimate(
      Sketches.kmvSketch(keyed(n, "b"), "grp", $"k", k = k), "grp", k).head()
    val est = big.getAs[Double]("est")
    assert(math.abs(est - n) / n < 3.0 / math.sqrt(k - 2.0),
      s"est=$est for n=$n out of tolerance")
  }

  test("KMV: duplicate arrivals never change the sketch (distinct-ness)") {
    import spark.implicits._
    val once = keyed(800, "d")
    val thrice = once.unionByName(once).unionByName(once)
    assert(Sketches.kmvSketch(once, "grp", $"k", k = 32)
      .orderBy("r").collect().toSeq ==
      Sketches.kmvSketch(thrice, "grp", $"k", k = 32)
        .orderBy("r").collect().toSeq)
  }

  test("KMV pair stats: overlap estimates track the true Jaccard and the group guard raises") {
    import spark.implicits._
    // two groups sharing exactly half their keys: J = 1/3
    val ga = (0 until 6000).map(i => (s"k$i", "A"))
    val gb = (3000 until 9000).map(i => (s"k$i", "B"))
    val df = (ga ++ gb).toDF("k", "grp")
    val k = 256
    val sk = Sketches.kmvSketch(df, "grp", $"k", k = k)
    val row = Sketches.kmvPairStats(sk, "grp", k).head()
    assert(row.getAs[String]("grp_a") == "A" && row.getAs[String]("grp_b") == "B")
    val jac = row.getAs[Double]("jacc_est")
    assert(math.abs(jac - 1.0 / 3.0) < 0.12, s"jacc_est=$jac far from 1/3")
    val inter = row.getAs[Double]("inter_est")
    assert(inter > 1500 && inter < 4500, s"inter_est=$inter far from 3000")
    // the deliberate nested loop is bounded: > maxGroups raises in-plan
    val many = (0 until 40).flatMap(g => (0 until 5).map(i => (s"k$i-$g", s"g$g")))
      .toDF("k", "grp")
    val manySk = Sketches.kmvSketch(many, "grp", $"k", k = 4)
    val e = intercept[Exception] {
      Sketches.kmvPairStats(manySk, "grp", 4, maxGroups = 8).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("maxGroups"),
      s"unexpected error: ${e.getMessage}")
  }

  test("DD quantiles: merge identity, relative-error bound vs exact, loud guards") {
    import spark.implicits._
    // deterministic skewed positives (squares spread buckets over decades)
    val vals = (1 to 4000).map(i => (1L + (i.toLong * i) % 999983L, "g"))
    val df = vals.toDF("v", "grp")
    val bk = Sketches.ddBuckets(df, "grp", $"v", sig = 4)
    // merge identity: halves collapse bucket-for-bucket to the whole
    val (h1, h2) = (vals.take(2000), vals.drop(2000))
    val merged = Sketches.ddCollapse(
      Sketches.ddBuckets(h1.toDF("v", "grp"), "grp", $"v", sig = 4)
        .unionByName(Sketches.ddBuckets(h2.toDF("v", "grp"), "grp", $"v", sig = 4)),
      "grp", "g")
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.select("grp", "lo", "hi", "cnt").as[(String, Long, Long, Long)]
        .collect().toSet
    assert(canon(merged) == canon(bk), "bucket-wise SUM must equal the whole's sketch")
    // every estimate's bucket holds the true order statistic: est <= exact < est*(1+2^-3)
    val qs = Seq(100, 500, 900, 990)
    val est = Sketches.ddQuantiles(bk, "grp", qs)
      .as[(String, Int, Long, Long)].collect().map(r => r._2 -> r._4).toMap
    val sorted = vals.map(_._1).sorted
    qs.foreach { q =>
      val exact = sorted((math.ceil(q * sorted.size / 1000.0) - 1).toInt.max(0))
      assert(est(q) <= exact && exact < est(q) + math.max(est(q) / 8, 1),
        s"q=$q est=${est(q)} exact=$exact outside the 2^-3 bucket bound")
    }
    // guards: non-positive and oversized values fail loudly
    val bad = Seq((0L, "g")).toDF("v", "grp")
    val e1 = intercept[Exception](Sketches.ddBuckets(bad, "grp", $"v").collect())
    assert(e1.getMessage.contains("positive"))
    val big = Seq((1L << 57, "g")).toDF("v", "grp")
    val e2 = intercept[Exception](Sketches.ddBuckets(big, "grp", $"v").collect())
    assert(e2.getMessage.contains("2^56"))
  }

  test("KMV build kernel: bottom-k aggregate equals the rank build, with no window in the plan") {
    import spark.implicits._
    val df = (0 until 4000).map(i => (s"x$i", s"g${i % 3}")).toDF("k", "grp")
    val sk = Sketches.kmvSketch(df, "grp", $"k", k = 48)
    // reference: the r10 distinct + window row_number shape, inline
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"h")
    val ref = df.select($"grp", Sketches.kmvHash($"k").as("h")).distinct()
      .withColumn("r", row_number().over(w).cast("int"))
      .filter($"r" <= 48)
    assert(sk.orderBy("grp", "r").collect().toSeq ==
      ref.orderBy("grp", "r").collect().toSeq)
    // the point of the kernel: partial aggregation before the exchange,
    // no per-group sort of the full distinct hash set
    val plan = sk.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"kmvSketch should not plan a window:\n$plan")
    assert(plan.contains("partial_bottom_k_longs"),
      s"expected map-side partial bottom_k_longs:\n$plan")
  }
}
