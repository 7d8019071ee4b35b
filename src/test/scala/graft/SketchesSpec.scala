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
}
