package graft.ops

import org.apache.spark.sql.DataFrame

/** Incremental maintenance of an inner equi-join VIEW — the join
  * complement of [[IncrementalAgg]]'s mergeable aggregate states.
  *
  * For view V = A ⋈ B, arrivals ΔA and ΔB change the view by exactly
  *
  *   ΔV = (ΔA ⋈ B_old) ∪ (A_old ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
  *
  * — the classic delta algebra. The scale property is what matters:
  * the two history-sized relations only ever join against a DELTA
  * (small by definition of an incremental refresh), never against
  * each other, so a refresh shuffles O(|Δ| + matched history rows)
  * where a recompute shuffles the whole history on both sides. With
  * both inputs bucketed on the join key the delta joins are
  * exchange-free on the history side.
  *
  * Inner-join semantics make the three terms disjoint by provenance
  * (old×old rows are already in V), so the delta appends — no
  * retraction logic. Updates/deletes are out of scope here: model
  * them as keyed upserts upstream ([[KeyedUpsert]]) and rebuild the
  * affected keys, or carry +/- multiplicities (the full DBSP/
  * differential treatment this deliberately stays short of). */
object IncrementalJoin {

  /** The view delta for arrivals (dA, dB) against snapshots
    * (aOld, bOld), joined on `keys`. Column set = the inner join's. */
  def joinDelta(aOld: DataFrame, dA: DataFrame, bOld: DataFrame,
      dB: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "joinDelta: at least one join key")
    dA.join(bOld, keys)
      .unionByName(aOld.join(dB, keys))
      .unionByName(dA.join(dB, keys))
  }

  /** Refreshed view: previous view content plus the delta. */
  def refresh(view: DataFrame, aOld: DataFrame, dA: DataFrame,
      bOld: DataFrame, dB: DataFrame, keys: Seq[String]): DataFrame =
    view.unionByName(joinDelta(aOld, dA, bOld, dB, keys))
}
