package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.{Ddl, Skew}

class SkewDdlSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount matches plain groupBy on a skewed key") {
    // 10k rows of one hot key + scattered tail
    val hot = Seq.fill(10000)(("hot", 1.25))
    val tail = (1 to 50).map(i => (s"k$i", i.toDouble))
    val df = (hot ++ tail).toDF("k", "v")
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", saltBuckets = 8)
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val plain = df.groupBy("k")
      .agg(sum($"v".cast("decimal(18,4)")).cast("double").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("saltedJoin equals plain join on skewed probe side") {
    val probe = (Seq.fill(5000)(1L) ++ Seq(2L, 3L)).toDF("k")
    val build = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "tag")
    val salted = Skew.saltedJoin(probe, build, "k", saltBuckets = 4)
      .groupBy("k", "tag").count().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val plain = probe.join(build, Seq("k"))
      .groupBy("k", "tag").count().orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("DDL lifecycle: create, insert, add column, drop") {
    val dir = java.nio.file.Files.createTempDirectory("ddl").toString
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    Ddl.createTable(spark, dir, "t1", schema)
    assert(Ddl.tableExists(spark, dir, "t1"))
    assert(spark.read.parquet(s"$dir/t1.parquet").count() == 0)

    Ddl.insertInto(Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir, "t1")
    assert(spark.read.parquet(s"$dir/t1.parquet").count() == 2)

    Ddl.addColumn(spark, dir, "t1", "flag", lit(true))
    val df = spark.read.parquet(s"$dir/t1.parquet")
    assert(df.columns.toSeq.contains("flag") && df.filter($"flag").count() == 2)

    // ALTER ... RENAME COLUMN: data survives under the new name
    Ddl.renameColumn(spark, dir, "t1", "name", "label")
    val renamed = spark.read.parquet(s"$dir/t1.parquet")
    assert(renamed.columns.toSeq == Seq("id", "label", "flag"))
    assert(renamed.select("label").as[String].collect().sorted.toSeq == Seq("a", "b"))
    intercept[IllegalArgumentException](
      Ddl.renameColumn(spark, dir, "t1", "nope", "x"))
    intercept[IllegalArgumentException](
      Ddl.renameColumn(spark, dir, "t1", "id", "label")) // target exists

    // ALTER ... DROP COLUMN: column gone, rows intact
    Ddl.dropColumn(spark, dir, "t1", "flag")
    val dropped = spark.read.parquet(s"$dir/t1.parquet")
    assert(dropped.columns.toSeq == Seq("id", "label") && dropped.count() == 2)
    intercept[IllegalArgumentException](Ddl.dropColumn(spark, dir, "t1", "flag"))

    Ddl.dropTable(spark, dir, "t1")
    assert(!Ddl.tableExists(spark, dir, "t1"))
  }
}
