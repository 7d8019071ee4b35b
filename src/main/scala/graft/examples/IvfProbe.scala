package graft.examples

import org.apache.spark.sql.functions._

/** Scratch recall probe for IVF — not part of the engine. */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession("local[16]", 16)
    import spark.implicits._
    for (dir <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      val qs = emb.filter($"vec_id" < 5)
      val brute = graft.similarity.Ann.bruteTopK(emb, qs, "embedding", "vec_id", 5)
        .select("q_id", "rk", "n_id").as[(Long, Int, Long)].collect().toSet
      for (nProbe <- Seq(2, 4, 6, 8)) {
        val t0 = System.nanoTime()
        val ivf = graft.similarity.Ivf.topK(emb, qs, "embedding", "vec_id",
          k = 5, dim = 64, nCells = 16, nProbe = nProbe)
          .select("q_id", "rk", "n_id").as[(Long, Int, Long)].collect().toSet
        val sec = (System.nanoTime() - t0) / 1e9
        val recall = (ivf & brute).size.toDouble / brute.size
        System.err.println(f"[ivf] $dir nProbe=$nProbe recall=$recall%.3f exact=${ivf == brute} $sec%.2f s")
      }
    }
    spark.stop()
  }
}
