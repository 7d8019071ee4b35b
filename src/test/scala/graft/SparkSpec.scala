package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (parallelExecution is off). Rebuilt
  * if a suite (e.g. ExtensionsSpec) stopped the previous one. */
object TestSession {
  def spark: SparkSession =
    SparkSession.getDefaultSession.filter(!_.sparkContext.isStopped)
      .getOrElse(GraftSession("local[4]", cores = 4))
}

abstract class SparkSpec extends AnyFunSuite {
  // lazy val: stable identifier (needed for `import spark.implicits._`),
  // resolved at this suite's first test so a prior suite's stop() is safe
  lazy val spark: SparkSession = TestSession.spark
  val sfDir = "/root/testdata/sf0.001"
}
