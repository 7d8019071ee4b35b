package graft.examples

import graft.{GraftSession, SparkEntry}

/** Dump the formatted physical plan of selected queries to files — the
  * before/after plan evidence the optimization rounds commit under
  * plans/rN/ (the judge reads those files instead of running Spark).
  *
  * Run: sbt "runMain graft.examples.PlanDump <outDir> <suffix> [query ...]"
  * writes <outDir>/<query>_<suffix>.txt for each named query (all queries
  * when none are named). SPARK_GRAFT_SF_DIR picks the data dir (plans are
  * data-size-independent up to AQE estimates; sf0.01 is fine).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.allDefs.map(_.name)
    names.foreach { n =>
      val plan =
        try SparkEntry.queries(n)(spark, dir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case scala.util.control.NonFatal(e) =>
          s"PLAN FAILED: ${e.getMessage}" }
      java.nio.file.Files.write(outDir.resolve(s"${n}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[plandump] $n -> ${n}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
