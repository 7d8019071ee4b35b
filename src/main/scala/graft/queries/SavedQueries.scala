package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Named-query registry: the reference's saved-queries feature
  * (SQL_DATA_INTEGRATION_TOOL.py:1114-1129 `save_query_as`, 1379-1395
  * load/save to saved_queries.json). Queries run through `spark.sql`, so the
  * full Spark SQL surface (and Catalyst optimization) applies; persistence
  * is the same name→SQL JSON file format.
  */
final class SavedQueries(path: String) {
  private var queries: Map[String, String] = loadFile()

  private def loadFile(): Map[String, String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Map.empty
    else try {
      JsonMethods.parse(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)) match {
        case JObject(fields) => fields.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty
      }
    } catch {
      // corrupt/empty registry file → start fresh (matches the reference's
      // load_queries_from_file error path, ref 1379-1387)
      case _: Exception => Map.empty
    }
  }

  def save(name: String, sql: String): Unit = {
    queries = queries + (name -> sql)
    val json = JsonMethods.compact(JsonMethods.render(
      JObject(queries.toList.sortBy(_._1).map { case (k, v) => k -> JString(v) })))
    Files.write(Paths.get(path), json.getBytes(StandardCharsets.UTF_8))
  }

  def list: Seq[String] = queries.keys.toSeq.sorted
  def get(name: String): Option[String] = queries.get(name)

  /** The Execute Query action (ref 1088-1111) for a saved query. */
  def run(spark: SparkSession, name: String): DataFrame =
    spark.sql(queries.getOrElse(name, sys.error(s"no saved query '$name'")))
}
