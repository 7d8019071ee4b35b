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
  * Delta rules, V = R ⋈ S on `joinKey`:
  *  - fact-side changelog ΔR ([[refresh]]):
  *    V' = (V − σ_{factId ∈ ΔR⁻} V) ∪ (ΔR⁺ ⋈ S). An UPDATE travels as
  *    delete + insert (the [[IncrementalAgg]] retraction discipline;
  *    [[Merge.snapshotDiff]]'s U rows expand to exactly that pair).
  *  - dimension-side changelog ΔS ([[refreshDim]]):
  *    V' = (V − σ_{joinKey ∈ ΔS⁻} V) ∪ (R ⋈ ΔS⁺). A dim retraction
  *    touches view rows by JOIN KEY, not fact id — every fact row of a
  *    retracted key leaves the view, and the re-inserted key's rows come
  *    back from the fact side with the new attributes. Slowly-changing
  *    dimensions that should KEEP history version via
  *    [[Merge.scd2FromChangelog]] instead of retracting it.
  *
  * Scale shape: only the delta joins the other table's rows; the
  * standing view is touched by one anti-join on the delete-key set — a
  * map-side broadcast filter by default, which bounds the DELTA, not
  * the data: the delete-key set must fit the broadcast budget (the
  * normal CDC case — a day's retractions, not a corpus). For
  * backfill/purge-scale retractions (a GDPR batch deleting 10⁸ keys)
  * pass `broadcastDeletes = false` and the anti-join degrades to a
  * shuffled join instead of a driver OOM.
  * The fact-side insert half joins delta-vs-dimension (delta-sized);
  * the dim-side insert half joins the FACT against the broadcast-small
  * dim delta — a map-side pass over the fact, or a pruned read when the
  * fact is bucketed/clustered on the join key ([[graft.ops.Bucketing]],
  * [[graft.sources.Layout.writeClustered]]). The output is a valid view
  * for the next refresh of either kind: refreshes chain indefinitely.
  */
object IncrementalJoin {

  /** The base materialization V = fact ⋈ dim on `joinKey`. */
  def materialize(fact: DataFrame, dim: DataFrame, joinKey: String): DataFrame =
    fact.join(dim, joinKey)

  /** Apply a fact-side changelog (rows shaped like `fact` plus op ±1)
    * to a view from [[materialize]] (or a prior refresh). `factId` is
    * the fact table's unique row key — deletes retract exactly the rows
    * carrying a retracted id. With `assertUniqueInserts` (a debug-mode
    * action), duplicate factId values in the insert half fail loudly
    * instead of silently double-inserting view rows that every later
    * refresh would then see. */
  def refresh(view: DataFrame, changelog: DataFrame, dim: DataFrame,
      joinKey: String, factId: String, opCol: String = "op",
      assertUniqueInserts: Boolean = false,
      broadcastDeletes: Boolean = true): DataFrame = {
    val dels0 = changelog.filter(col(opCol) < 0).select(col(factId)).distinct()
    val dels = if (broadcastDeletes) broadcast(dels0) else dels0
    val ins = changelog.filter(col(opCol) > 0).drop(opCol)
    if (assertUniqueInserts) {
      val dup = ins.groupBy(col(factId)).count().filter(col("count") > 1).limit(1)
        .collect()
      require(dup.isEmpty,
        s"IncrementalJoin.refresh: duplicate $factId=${dup.headOption.map(_.get(0))} " +
          "in the insert half — an UPDATE must travel as delete + insert")
    }
    view.join(dels, Seq(factId), "left_anti")
      .unionByName(ins.join(dim, joinKey).select(view.columns.map(col): _*))
      // a using-column join moves its key to the front — restore the
      // view's column order so refreshes chain shape-stably
      .select(view.columns.map(col): _*)
  }

  /** Apply a dimension-side changelog (rows shaped like `dim` plus op
    * ±1) to a view. `fact` must be the fact table CONSISTENT with the
    * view's fact side (apply fact deltas via [[refresh]] first, or
    * interleave — the legs commute when their deltas are disjoint).
    * A dim UPDATE travels as delete + insert of the same `joinKey`. */
  def refreshDim(view: DataFrame, changelog: DataFrame, fact: DataFrame,
      joinKey: String, opCol: String = "op",
      broadcastDeletes: Boolean = true): DataFrame = {
    val delKeys0 = changelog.filter(col(opCol) < 0).select(col(joinKey)).distinct()
    val delKeys = if (broadcastDeletes) broadcast(delKeys0) else delKeys0
    val ins = changelog.filter(col(opCol) > 0).drop(opCol)
    view.join(delKeys, Seq(joinKey), "left_anti")
      .unionByName(fact.join(ins, joinKey).select(view.columns.map(col): _*))
      .select(view.columns.map(col): _*)
  }
}
