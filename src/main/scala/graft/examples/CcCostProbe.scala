package graft.examples

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Stage-cost probe for the [[graft.dedup.Dedup.connectedComponents]]
  * fixpoint — the kernel under q69/q101/q125/q185/q226/q228/q236 and the
  * streaming component fold. Two candidate reworks, both exact identities
  * on CANONICAL (u < v) edge sets, which every round of the alternating
  * star iteration maintains:
  *
  *  - halved star joins: in largeStar the post-join `v > u` filter keeps
  *    exactly the un-flipped rows of bothDirs(e), so the join probe side
  *    can be e itself (half the rows, no filter); in smallStar the
  *    `v < u` pre-filter keeps exactly the flipped rows, so the union +
  *    filter collapses to one flip projection.
  *  - inter-star truncation: smallStar(largeStar(e)) as ONE lazy plan
  *    references the largeStar subtree 4x (bothDirs 2x, its groupBy, the
  *    join) — Spark's exchange reuse dedupes the aggregation exchange but
  *    re-executes the join+distinct; an eager localCheckpoint between the
  *    stars trades one materialization for those re-executions.
  *
  * The probe asserts variant outputs equal the current implementation's
  * (count + xor-of-hash signature over the (id, cluster_id) map), then
  * times each on (a) the answer-sized near-dup pair load the dedup
  * queries feed it and (b) a 200k-edge synthetic with long chains and a
  * boilerplate clique — the shape that needs several rounds.
  *
  * Run: sbt "runMain graft.examples.CcCostProbe"  (SPARK_GRAFT_SF_DIR)
  */
object CcCostProbe {

  private def bothDirs(e: DataFrame) =
    e.unionByName(e.select(col("v").as("u"), col("u").as("v")))

  /** The current implementation's stars, verbatim. */
  private def largeStar0(e: DataFrame) = {
    val d = bothDirs(e)
    val m = d.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    d.join(m, "u").filter(col("v") > col("u"))
      .select(col("m").as("u"), col("v")).distinct()
  }
  private def smallStar0(e: DataFrame) = {
    val d = bothDirs(e).filter(col("v") < col("u"))
    val m = d.groupBy("u").agg(min(col("v")).as("m"))
    d.join(m, "u").filter(col("v") =!= col("m"))
      .select(col("m").as("u"), col("v"))
      .unionByName(m.select(col("m").as("u"), col("u").as("v")))
      .distinct()
  }

  /** Halved joins: e canonical ⇒ bothDirs(e).filter(v > u) = e and
    * bothDirs(e).filter(v < u) = flip(e). */
  private def largeStar1(e: DataFrame) = {
    val m = bothDirs(e).groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    e.join(m, "u")
      .select(col("m").as("u"), col("v")).distinct()
  }
  private def smallStar1(e: DataFrame) = {
    val d = e.select(col("v").as("u"), col("u").as("v"))
    val m = d.groupBy("u").agg(min(col("v")).as("m"))
    d.join(m, "u").filter(col("v") =!= col("m"))
      .select(col("m").as("u"), col("v"))
      .unionByName(m.select(col("m").as("u"), col("u").as("v")))
      .distinct()
  }

  private def run(pairs: DataFrame,
      large: DataFrame => DataFrame, small: DataFrame => DataFrame,
      interTruncate: Boolean): DataFrame = {
    var edges = pairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct().localCheckpoint(true)
    var sig: (Long, Long) = null
    var rounds = 0
    var done = false
    while (!done) {
      val ls = if (interTruncate) large(edges).localCheckpoint(true) else large(edges)
      val next = small(ls).localCheckpoint(true)
      val row = next.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
      val nextSig = (row.getLong(0), row.getLong(1))
      edges = next
      rounds += 1
      if (nextSig == sig) done = true else sig = nextSig
    }
    System.err.println(s"[probe]   rounds=$rounds")
    edges.select(col("v").as("id"), col("u").as("cluster_id"))
      .unionByName(edges.select(col("u").as("id"), col("u").as("cluster_id")).distinct())
  }

  private def mapSig(m: DataFrame): (Long, Long) = {
    val r = m.agg(count(lit(1)), expr("bit_xor(xxhash64(id, cluster_id))")).head()
    (r.getLong(0), r.getLong(1))
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }

    // (a) the answer-sized near-dup pair load (q125's component stage)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    val pairsSmall = graft.dedup.Dedup
      .minHashPairs(docs, "text", "doc_id", threshold = 0.7)
      .select(col("id_a"), col("id_b")).localCheckpoint(true)
    // (b) synthetic: 2000 chains of 100 nodes + one 5000-member clique
    // star (hub 0) + cross-links every 1000 nodes — needs several rounds
    val chain = spark.range(200000L).toDF("i")
      .select(col("i").as("id_a"), (col("i") + 1).as("id_b"))
      .filter(col("id_b") % 100 =!= 0)
    val hub = spark.range(5000L).toDF("i")
      .select(lit(300000L).as("id_a"), (col("i") * 7 + 300001L).as("id_b"))
    val cross = spark.range(200L).toDF("i")
      .select((col("i") * 1000).as("id_a"), (col("i") * 1000 + 500).as("id_b"))
    val pairsBig = chain.unionByName(hub).unionByName(cross)
      .localCheckpoint(true)

    println(s"[probe] small pairs=${pairsSmall.count()}  big pairs=${pairsBig.count()}")

    // identity gates
    val base = graft.dedup.Dedup.connectedComponents(pairsSmall, "id_a", "id_b")
    val s0 = mapSig(base)
    Seq(
      ("halved", largeStar1 _, smallStar1 _, false),
      ("halved+intertrunc", largeStar1 _, smallStar1 _, true),
      ("current+intertrunc", largeStar0 _, smallStar0 _, true)
    ).foreach { case (name, l, s, t) =>
      val v = mapSig(run(pairsSmall, l, s, t))
      require(v == s0, s"$name mismatch on small load: $v vs $s0")
      println(s"[probe] identity OK: $name")
    }
    val baseBig = graft.dedup.Dedup.connectedComponents(pairsBig, "id_a", "id_b")
    val sb = mapSig(baseBig)
    Seq(("halved", largeStar1 _, smallStar1 _, false)).foreach { case (name, l, s, t) =>
      val v = mapSig(run(pairsBig, l, s, t))
      require(v == sb, s"$name mismatch on big load: $v vs $sb")
      println(s"[probe] identity OK on big: $name")
    }

    // timings, interleaved twice so a weather window can't favor one side
    (1 to 2).foreach { rep =>
      if (args.contains("noaqe"))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
      println(s"[probe] --- repetition $rep (aqe=${spark.conf.get("spark.sql.adaptive.enabled")}) ---")
      time("small: current")(mapSig(
        graft.dedup.Dedup.connectedComponents(pairsSmall, "id_a", "id_b"))._1)
      time("small: halved")(mapSig(
        run(pairsSmall, largeStar1, smallStar1, interTruncate = false))._1)
      time("small: halved+intertrunc")(mapSig(
        run(pairsSmall, largeStar1, smallStar1, interTruncate = true))._1)
      time("small: current+intertrunc")(mapSig(
        run(pairsSmall, largeStar0, smallStar0, interTruncate = true))._1)
      time("big: current")(mapSig(
        graft.dedup.Dedup.connectedComponents(pairsBig, "id_a", "id_b"))._1)
      time("big: halved")(mapSig(
        run(pairsBig, largeStar1, smallStar1, interTruncate = false))._1)
      time("big: halved+intertrunc")(mapSig(
        run(pairsBig, largeStar1, smallStar1, interTruncate = true))._1)
      time("big: current+intertrunc")(mapSig(
        run(pairsBig, largeStar0, smallStar0, interTruncate = true))._1)
    }
    spark.stop()
  }
}
