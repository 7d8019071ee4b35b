package graft.examples

import org.apache.spark.sql.functions._

/** Recall probe for IVF — not part of the engine. Two corpora:
  *
  *  1. The driver's near-isotropic `embeddings` tables — the honest
  *     worst case (no cluster structure ⇒ recall ≈ nProbe/nCells, as the
  *     Ivf scaladoc documents).
  *  2. A CLUSTERED corpus (GenData.clusteredEmbeddings — the structure
  *     real text/image embeddings have, and what IVF exists for): here
  *     the quantizer's cells align with the planted clusters and recall
  *     reaches ≥0.9 at nProbe ≪ nCells. Numbers cited in SURVEY §6.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("local[16]", 16)
    import spark.implicits._

    def recallCurve(tag: String, emb: org.apache.spark.sql.DataFrame,
        nQueries: Int, nCells: Int, probes: Seq[Int]): Unit = {
      val qs = emb.filter($"vec_id" < nQueries)
      val brute = graft.similarity.Ann.bruteTopK(emb, qs, "embedding", "vec_id", 5)
        .select("q_id", "rk", "n_id").as[(Long, Int, Long)].collect().toSet
      for (nProbe <- probes) {
        val t0 = System.nanoTime()
        val ivf = graft.similarity.Ivf.topK(emb, qs, "embedding", "vec_id",
          k = 5, dim = 64, nCells = nCells, nProbe = nProbe)
          .select("q_id", "rk", "n_id").as[(Long, Int, Long)].collect().toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = (ivf & brute).size.toDouble / brute.size
        System.err.println(f"[ivf] $tag nCells=$nCells nProbe=$nProbe " +
          f"probeFrac=${nProbe.toDouble / nCells}%.3f recall=$recall%.3f " +
          f"exact=${ivf == brute} $sec%.2f s")
      }
    }

    // isotropic (driver corpus): recall ≈ nProbe/nCells — the honest floor
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      recallCurve(s"isotropic:$dir", emb, nQueries = 5, nCells = 16,
        probes = Seq(2, 4, 6, 8))
    }

    // clustered (what real embedding corpora look like): 64 planted
    // clusters, noise 0.3 — recall should reach ≥0.9 at probeFrac ≤ 0.25
    val clustered = GenData.clusteredEmbeddings(spark, n = 20000, dim = 64,
      nClusters = 64, noise = 0.3)
    recallCurve("clustered(64c,noise0.3)", clustered, nQueries = 20,
      nCells = 64, probes = Seq(1, 2, 4, 8, 16))

    // heavily-overlapping clusters (noise norm ~2x center norm):
    // the transition regime between clustered and isotropic
    val overlapping = GenData.clusteredEmbeddings(spark, n = 20000, dim = 64,
      nClusters = 64, noise = 2.0)
    recallCurve("clustered(64c,noise2.0)", overlapping, nQueries = 20,
      nCells = 64, probes = Seq(1, 2, 4, 8, 16))

    spark.stop()
  }
}
