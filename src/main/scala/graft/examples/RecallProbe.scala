package graft.examples
import graft.{GraftSession}
import graft.sources.Tables
import graft.similarity.Ann
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("local[16]", 16)
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter($"vec_id" < 50)
    val brute = Ann.bruteTopK(emb, q, "embedding", "vec_id", 5)
      .select("q_id", "n_id").as[(Long, Long)].collect().toSet
    for ((planes, bits) <- Seq((16,4),(24,4),(32,4),(30,5),(24,3))) {
      val t0 = System.nanoTime()
      val lsh = Ann.lshTopK(emb, q, "embedding", "vec_id", 5, 64, planes, bits)
        .select("q_id", "n_id").as[(Long, Long)].collect().toSet
      val sec = (System.nanoTime()-t0)/1e9
      println(f"[recall] planes=$planes bits=$bits recall=${(brute & lsh).size.toDouble / brute.size}%.2f time=$sec%.1fs")
    }
    spark.stop()
  }
}
