package graft.examples
import graft.GraftSession
import graft.sources.Tables
import graft.similarity.Ann

/** Measures LSH ANN recall@5 vs the exact brute-force baseline. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[16]", 16)
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter($"vec_id" < 50)
    val brute = Ann.bruteTopK(emb, q, "embedding", "vec_id", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    for (probe <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val lsh = Ann.lshTopK(emb, q, "embedding", "vec_id", 5, 64, multiProbe = probe)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[recall] multiProbe=$probe recall=${(brute & lsh).size.toDouble / brute.size}%.2f time=$sec%.1fs")
    }
    spark.stop()
  }
}
