package graft

/** Smoke-level invariants for every SparkEntry query at sf0.001 — the
  * deep value check is the driver's DuckDB oracle compare (tools/check.py);
  * this guards against regressions that break a plan outright. */
class QueriesSpec extends SparkSpec {

  test("every registered query runs and returns rows at sf0.001") {
    val failures = SparkEntry.allDefs.flatMap { d =>
      try {
        val n = d.run(spark, sfDir).count()
        if (n > 0) None else Some(s"${d.name}: 0 rows")
      } catch { case e: Throwable => Some(s"${d.name}: ${e.getMessage.take(120)}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("oracle map only references registered queries, names align") {
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
    assert(SparkEntry.allDefs.map(_.name).distinct.size == SparkEntry.allDefs.size)
  }

  test("entry() flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
