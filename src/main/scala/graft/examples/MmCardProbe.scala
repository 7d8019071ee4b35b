package graft.examples

import org.apache.spark.sql.functions._

/** Stage-cost probe for MultimodalPipeline.card's image leg — where does
  * q189 spend its wall, and how does codec-stage rebalancing move each
  * stage? (r15 optimization evidence.)
  *
  * Run: sbt "runMain graft.examples.MmCardProbe"  (SPARK_GRAFT_SF_DIR)
  */
object MmCardProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.multimodal.Multimodal
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    docs.count()
    (1 to 2).foreach { rep =>
      println(s"[probe] --- repetition $rep ---")
      val organic = docs.select(col("doc_id")).filter(col("doc_id") % 3 =!= 1)
      val assets = Multimodal.synthImages(spark, organic)
        .unionByName(Multimodal.synthTwinImages(spark, nPairs = 8, base = 3000000L))
      val mat = time("mat checkpoint (encode)")(assets.localCheckpoint(true))
      val narrow = args.contains("narrow")
      val bands = time("bands checkpoint (decode)")(
        (if (narrow) Multimodal.aHashBands(spark, mat).repartition(2)
         else Multimodal.aHashBands(spark, mat)).localCheckpoint(true))
      val bandKey = Seq("b0", "b1", "b2", "b3")
      val classes = bands.groupBy(bandKey.map(col): _*)
        .agg(min(col("doc_id")).as("rep"))
      val idRep = bands.join(classes, bandKey).select(col("doc_id"), col("rep"))
      val nearPairs = Multimodal.imageNearDupPairs(bands, maxHamming = 3)
        .filter(col("id_a") =!= col("id_b")).select("id_a", "id_b")
      val comps = time("components fixpoint")(
        graft.dedup.Dedup.connectedComponents(nearPairs, "id_a", "id_b")
          .localCheckpoint(true))
      val dropped = idRep.filter(col("doc_id") =!= col("rep")).select("doc_id")
        .unionByName(comps.filter(col("id") =!= col("cluster_id"))
          .select(col("id").as("doc_id")))
        .distinct()
      val survivors = mat.join(broadcast(dropped), Seq("doc_id"), "left_anti")
      val aug = Multimodal.augmentImages(spark, survivors, epoch = "ep3").toDF()
        .select(col("doc_id"), col("sum_rgb").as("stat"), col("wsum").as("wstat"))
      time("augment agg (decode rt)")(
        aug.agg(count(lit(1)), sum(col("stat")), sum(col("wstat"))).head())
      time("nAssets")(mat.agg(count(lit(1))).head())
    }
    spark.stop()
  }
}
