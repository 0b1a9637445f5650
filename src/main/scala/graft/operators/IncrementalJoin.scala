package graft.operators

import org.apache.spark.sql.DataFrame

/** Incremental view maintenance for inner equi-joins — the join-side
  * complement of the engine's aggregate IVM (`q41`, mergeable partials)
  * and sketch IVM (`q49`, register max-merge).
  *
  * For a materialized `L ⋈ R` and delta batches ΔL, ΔR, the new result is
  *
  *   (L ∪ ΔL) ⋈ (R ∪ ΔR)  =  (L ⋈ R)  ∪  Δ(L ⋈ R)
  *   Δ(L ⋈ R)  =  ΔL ⋈ (R ∪ ΔR)  ∪  L ⋈ ΔR
  *
  * — the standard two-term delta form (the naive three-term expansion
  * ΔL⋈R ∪ L⋈ΔR ∪ ΔL⋈ΔR folds its first and third terms into one join).
  * At 100 TB this is the difference between refreshing a joined view by
  * re-shuffling BOTH full inputs and shuffling |Δ| against each: the two
  * delta joins hash-partition the small delta sides, and Catalyst
  * broadcasts them outright when they fit, touching the big stored sides
  * only as probe inputs. Append-only semantics (bag union, no retractions)
  * — updates/deletes route through [[LakeMaintenance.mergeUpsert]]'s
  * key-versioned model instead. */
object IncrementalJoin {

  /** The join delta Δ(L ⋈ R) for append batches `deltaL`/`deltaR` against
    * stored sides `baseL`/`baseR`, as an inner equi-join on `keys`.
    * Returns exactly the rows the refreshed view gains; maintain the view
    * with `stored.unionByName(joinDelta(...))`. */
  def joinDelta(baseL: DataFrame, deltaL: DataFrame,
                baseR: DataFrame, deltaR: DataFrame,
                keys: Seq[String]): DataFrame =
    deltaL.join(baseR.unionByName(deltaR), keys)
      .unionByName(baseL.join(deltaR, keys))
}
