package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding pooling — the chunk→document aggregation step of a
  * retrieval pipeline: documents are embedded CHUNK-wise (the context
  * window bounds what the encoder sees; q49 produces the chunks), and
  * the document-level vector every doc-granularity consumer needs
  * (q115's semantic dedup, coarse ANN routing, doc-level diversity
  * sampling) is the component-wise MEAN of its chunk vectors.
  *
  * Integer-exact protocol (the §5 discipline): components quantize to
  * micro-units (`round(x·10⁶)`, computed in double from the float32
  * both engines read), the pool is Σ div n — truncating integral
  * division, identical in Spark/DuckDB/JVM including negatives (the
  * q108 convention) — so the pooled vector is bit-identical on any
  * engine and safe to feed the downstream integer operators.
  *
  * Scale shape: one posexplode (linear in chunks×dim) into a
  * partial-aggregated groupBy(doc, pos) — map-side combine, the only
  * shuffle — then the components regroup per doc (second answer-sized
  * shuffle). Nothing is ever collected; output is doc-count × dim.
  */
object Pooling {

  /** Mean-pool `vecCol` (array<float>) per `groupCol`: returns
    * (groupCol, n_chunks, pooled) with `pooled` the micro-unit
    * array<long> mean, components in position order. */
  def meanPool(chunks: DataFrame, groupCol: String, vecCol: String,
      scale: Long = 1000000L): DataFrame = {
    val q = transform(col(vecCol), x => round(x.cast("double") * scale).cast("long"))
    chunks
      .select(col(groupCol), posexplode(q).as(Seq("pos", "q")))
      .groupBy(col(groupCol), col("pos"))
      .agg(sum("q").as("s"), count(lit(1)).as("n"))
      .select(col(groupCol), col("pos"), expr("s div n").as("m"), col("n"))
      .groupBy(col(groupCol))
      .agg(max("n").as("n_chunks"),
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("pooled"))
  }
}
