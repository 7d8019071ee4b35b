package graft

/** Smoke-level invariants for every SparkEntry query at sf0.001 — the
  * deep value check is the driver's DuckDB oracle compare (tools/check.py);
  * this guards against regressions that break a plan outright. */
class QueriesSpec extends SparkSpec {

  /** §5 surface rule (r12): no registered query may put a DECIMAL of
    * precision > 18 in its FINAL output — the driver's cross-engine
    * hash canonicalizes wide decimals differently between the Spark
    * parquet read and DuckDB (the r11 q159/q162/q165/q170/q173 class).
    * Internal wide-decimal arithmetic is fine and load-bearing; the
    * surface casts to string (digits are digits in every engine). */
  private def wideDecimals(dt: org.apache.spark.sql.types.DataType,
      path: String): Seq[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case d: DecimalType if d.precision > 18 => Seq(s"$path: $d")
      case s: StructType => s.fields.toSeq.flatMap(f => wideDecimals(f.dataType, s"$path.${f.name}"))
      case a: ArrayType => wideDecimals(a.elementType, s"$path[]")
      case m: MapType => wideDecimals(m.keyType, s"$path.key") ++
        wideDecimals(m.valueType, s"$path.value")
      case _ => Nil
    }
  }

  test("every registered query runs, returns rows, and surfaces no wide decimal") {
    val failures = SparkEntry.allDefs.flatMap { d =>
      try {
        val df = d.run(spark, sfDir)
        val wide = df.schema.fields.toSeq.flatMap(f => wideDecimals(f.dataType, f.name))
        val n = df.count()
        if (n == 0) Some(s"${d.name}: 0 rows")
        else if (wide.nonEmpty) Some(s"${d.name}: wide decimal in output (${wide.mkString(", ")}) — cast to string at the surface (§5)")
        else None
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
