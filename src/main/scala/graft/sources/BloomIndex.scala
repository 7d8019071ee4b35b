package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FILE-level Bloom-filter index — point-lookup pruning for keys a
  * zonemap cannot help with. [[Layout.prunedFiles]] skips files by
  * min/max range, which needs the key CLUSTERED; a hash-distributed or
  * append-ordered corpus has every file spanning the whole key range, so
  * range stats prune nothing. A per-file Bloom filter prunes by
  * MEMBERSHIP instead: an equality probe reads only the files whose
  * filter claims the key — ~1 file + false positives for a unique key,
  * at ANY layout (the Iceberg/Delta bloom-column discipline; parquet's
  * own optional per-column bloom serves the same role row-group-locally).
  *
  * Determinism/portability: bit positions are the repo's md5-prefix
  * convention (h_i(key) = md5_60("salt:i:key") mod m), so the index is
  * reproducible anywhere and carries no RNG state. Never wrong, only
  * conservative: a dropped file PROVABLY lacks the key (all-bits-set is
  * necessary for presence); false positives cost an extra file read,
  * never a missing row.
  *
  * Scale shape: the build is ONE corpus scan — k codegen md5s per row
  * into a map-side-combined bit_or aggregate; the shuffle carries at
  * most files × m/64 packed words, and the manifest is files × (m/8)
  * bytes (32 KiB per file at the default m = 2^18 — 3 MB for a
  * 100-file corpus, metadata-sized at any data volume). Probing touches
  * only the manifest. Size m for the per-FILE row count: false-positive
  * rate ≈ (1 − e^(−k·n/m))^k — at n = 10^6 rows/file and m = 2^23,
  * k = 4: ~0.24% per file.
  */
object BloomIndex {

  /** 60-bit md5-prefix position hash — [[graft.ops.Sketches]]' h60
    * convention applied to (salt, i, key). */
  private def posHash(salt: String, i: Column, key: Column, mBits: Int): Column =
    pmod(conv(substring(md5(concat_ws(":", lit(salt), i.cast("string"),
      key.cast("string"))), 1, 15), 16, 10).cast("long"), lit(mBits.toLong))

  /** Build the per-file Bloom manifest for `column` over every parquet
    * file in `dir`: (file, words = array of m/64 packed longs). One
    * corpus scan, map-side-combined `bit_or`. */
  def build(spark: SparkSession, dir: String, column: String,
      mBits: Int = 1 << 18, kHashes: Int = 4,
      salt: String = "bloomidx"): DataFrame = {
    require(mBits >= 64 && mBits % 64 == 0, s"mBits=$mBits must be a multiple of 64")
    require(kHashes >= 1, s"kHashes=$kHashes must be >= 1")
    val nWords = mBits / 64
    spark.read.parquet(dir)
      .select(col("_metadata.file_path").as("file"),
        col(column).cast("string").as("k"))
      .filter(col("k").isNotNull)
      .select(col("file"), explode(sequence(lit(0), lit(kHashes - 1))).as("i"), col("k"))
      .select(col("file"), posHash(salt, col("i"), col("k"), mBits).as("pos"))
      // word index by integer division; the bit mask via the SQL-form
      // shiftleft, which (unlike the Scala API) takes a column shift
      .select(col("file"), expr("CAST(pos DIV 64 AS INT)").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").as("mask"))
      .groupBy(col("file"), col("word"))
      .agg(expr("bit_or(mask)").as("bits"))
      .groupBy(col("file"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits")))).as("e"))
      .select(col("file"),
        transform(sequence(lit(0), lit(nWords - 1)),
          w => coalesce(element_at(col("e"), w), lit(0L))).as("words"))
  }

  /** The file subset that MAY contain any of `keys`, per the manifest: a
    * file survives iff some key has ALL k bit positions set in its
    * filter. The probe plan touches only the manifest (files × keys × k
    * rows — metadata-sized); md5 positions are computed by the same
    * Spark expressions that built the index, so no driver-side hash
    * reimplementation can drift. */
  def keptFiles(spark: SparkSession, manifest: DataFrame, keys: Seq[String],
      mBits: Int = 1 << 18, kHashes: Int = 4,
      salt: String = "bloomidx"): Seq[String] = {
    import spark.implicits._
    require(keys.nonEmpty, "empty probe batch")
    val probes = keys.toDF("k")
      .select(col("k"), explode(sequence(lit(0), lit(kHashes - 1))).as("i"))
      .select(col("k"), posHash(salt, col("i"), col("k"), mBits).as("pos"))
    manifest.crossJoin(broadcast(probes))
      .select(col("file"), col("k"),
        (element_at(col("words"), expr("CAST(pos DIV 64 AS INT)") + 1)
          .bitwiseAND(expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))"))
          =!= 0L).cast("int").as("hit"))
      .groupBy(col("file"), col("k"))
      .agg(min(col("hit")).as("all_bits"))      // AND over the k positions
      .groupBy(col("file"))
      .agg(max(col("all_bits")).as("any_key"))  // OR over the probe keys
      .filter(col("any_key") === 1)
      .select(col("file")).as[String].collect().sorted.toSeq
  }

  /** Equality-probe scan through the index: read only the admitted files,
    * with the residual IN-filter pushed to the scan in the column's OWN
    * type (no string cast in the predicate — row-group stats and
    * parquet's dictionaries keep pruning inside kept files). Probe
    * hashing stringifies via String.valueOf, matching the build's
    * cast-to-string for integral and string keys (the intended key
    * classes). An all-files-pruned probe returns an empty frame of the
    * right schema. */
  def readPruned(spark: SparkSession, dir: String, manifest: DataFrame,
      column: String, keys: Seq[Any], mBits: Int = 1 << 18,
      kHashes: Int = 4, salt: String = "bloomidx"): DataFrame = {
    val keep = keptFiles(spark, manifest, keys.map(String.valueOf),
      mBits, kHashes, salt)
    val residual = col(column).isin(keys: _*)
    if (keep.isEmpty) spark.read.parquet(dir).filter(residual).limit(0)
    else spark.read.parquet(keep: _*).filter(residual)
  }
}
