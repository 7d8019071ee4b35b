package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized JOIN — the third leg of
  * the repo's view-maintenance family: [[Merge.snapshotDiff]] PRODUCES
  * a changelog, [[IncrementalAgg]] refreshes a group-aggregate from
  * one, and this refreshes a join materialization from one. Together
  * they are the lakehouse pattern where a denormalized table (fact ⋈
  * dimensions) stays fresh at O(|delta|) joined work instead of
  * re-joining the full fact table per batch — at 100 TB, the
  * difference between joining one day's partition and joining three
  * years of them.
  *
  * Delta rule (fact-side changelog, dimension static): with V = R ⋈ S,
  * ΔR applied as retractions gives V' = (V − σ_deleted V) ∪ (ΔR⁺ ⋈ S).
  * An UPDATE travels as delete + insert (the [[IncrementalAgg]]
  * retraction discipline; [[Merge.snapshotDiff]]'s U rows expand to
  * exactly that pair). Dimension-side deltas are the symmetric call
  * with roles swapped; slowly-changing dimensions usually version via
  * [[Merge.scd2FromChangelog]] instead of retracting history.
  *
  * Scale shape: ONLY the delta joins the dimension (delta-sized join,
  * dim broadcast when small); the standing view is touched by one
  * anti-join on the broadcast delete-key set — a map-side filter, no
  * view shuffle. Rows are identified by a unique fact key, so deletes
  * remove exactly the retracted rows. The output is a valid view for
  * the next refresh: refreshes chain indefinitely.
  */
object IncrementalJoin {

  /** The base materialization V = fact ⋈ dim on `joinKey`. */
  def materialize(fact: DataFrame, dim: DataFrame, joinKey: String): DataFrame =
    fact.join(dim, joinKey)

  /** Apply a fact-side changelog (rows shaped like `fact` plus op ±1)
    * to a view from [[materialize]] (or a prior refresh). `factId` is
    * the fact table's unique row key. */
  def refresh(view: DataFrame, changelog: DataFrame, dim: DataFrame,
      joinKey: String, factId: String, opCol: String = "op"): DataFrame = {
    val dels = changelog.filter(col(opCol) < 0).select(col(factId)).distinct()
    val ins = changelog.filter(col(opCol) > 0).drop(opCol)
    view.join(broadcast(dels), Seq(factId), "left_anti")
      .unionByName(ins.join(dim, joinKey).select(view.columns.map(col): _*))
      // a using-column join moves its key to the front — restore the
      // view's column order so refreshes chain shape-stably
      .select(view.columns.map(col): _*)
  }
}
