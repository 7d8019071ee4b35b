package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the graft native
  * expressions as SQL functions, so `spark.sql("SELECT float_vec_dot(a,b)")`
  * works next to the Column API. Activate with
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("float_vec_dot"),
      info("float_vec_dot", "float_vec_dot(a, b) - dot product of two float arrays (double accumulation)"),
      (args: Seq[Expression]) => FloatVecDot(args(0), args(1))))

    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(hashes) - 64-bit SimHash of an array of token hashes"),
      (args: Seq[Expression]) => SimHash64(args(0))))

    ext.injectFunction((
      FunctionIdentifier("scored_top_k"),
      info("scored_top_k",
        "scored_top_k(score, id, k) - aggregate: the k highest-score (score, id) pairs per group, distinct by id, sorted; partial-aggregates map-side"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "scored_top_k(score, id, k) takes 3 arguments")
        require(args(2).foldable, "scored_top_k's k must be a literal")
        ScoredTopK(args(0), args(1),
          args(2).eval().asInstanceOf[Number].intValue())
      }))

    // whole-operator path: plans CosineTopKPlan nodes
    ext.injectPlannerStrategy(_ => CosineTopKStrategy)

    // conf-gated rewrite: COUNT(DISTINCT x) -> HLL++ sketch
    ext.injectOptimizerRule(session => ApproxDistinctRule(session))
  }
}
