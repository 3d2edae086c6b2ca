package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates: keep a
  * materialized per-key aggregate table fresh by aggregating ONLY the
  * arriving batch and merging states, instead of re-sweeping the corpus.
  * Works for any aggregate whose state merges by addition (count, sum —
  * and through them mean; min/max merge the same way with max/min
  * columns), which is exactly Spark's partial-aggregate contract: this
  * operator extends map-side combine across TIME the way Spark applies
  * it across partitions. At 100 TB the difference is a batch-sized scan
  * + a snapshot-sized merge join vs a corpus-sized recompute per
  * refresh.
  *
  * Contract: `snapshot` and `batchState` share the schema
  * (keys ++ additive state columns); the result again has that schema —
  * `mergeAggState` is closed under itself, so daily states roll into
  * weekly into monthly (the same property the spec pins by proving
  * merge(merge(a,b),c) == aggregate(a∪b∪c)). One shuffle on the group
  * key; AQE broadcasts the batch side when it is small.
  */
object Ivm {

  def mergeAggState(
      snapshot: DataFrame,
      batchState: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(snapshot.columns.toSeq == batchState.columns.toSeq,
      s"state schemas differ: ${snapshot.columns.toSeq} vs ${batchState.columns.toSeq}")
    val metrics = snapshot.columns.filterNot(keys.contains)
    snapshot.unionByName(batchState)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(metrics.head)).as(metrics.head),
        metrics.tail.map(m => sum(col(m)).as(m)): _*)
  }

  /** Incremental maintenance of an INNER-join view under insert-only
    * deltas — the algebraic derivative of the join (the classic IVM
    * identity, e.g. Gupta & Mumick's survey): with A' = A ∪ ΔA and
    * B' = B ∪ ΔB,
    *
    *   Δ(A ⋈ B) = A'⋈B' − A⋈B = (ΔA ⋈ B) ∪ (A' ⋈ ΔB)
    *
    * (the ΔA⋈ΔB cross term lands in the second leg, counted once). Cost
    * is |Δ|-proportional: each leg shuffles one DELTA side against a
    * base relation — at 100 TB that is a batch-sized scan and two
    * delta-keyed joins (AQE broadcasts small deltas), vs re-running the
    * corpus-sized join per refresh. Appending the returned rows to the
    * materialized view keeps it exactly equal to A' ⋈ B'.
    */
  def joinDelta(
      baseA: DataFrame, deltaA: DataFrame,
      baseB: DataFrame, deltaB: DataFrame,
      cond: org.apache.spark.sql.Column): DataFrame =
    deltaA.join(baseB, cond)
      .unionByName(baseA.unionByName(deltaA).join(deltaB, cond))

  /** Incremental top-k view maintenance under INSERT batches: top-k per
    * key is closed under merge — topk(state ∪ batch) = topk(topk(state) ∪
    * batch) — so a refresh touches only the k·|keys| materialized state
    * rows plus the batch, never the base corpus (the property that makes a
    * leaderboard view maintainable at 100 TB). Ordering is by `orderCols`
    * ascending (caller pre-negates for descending), extended by the
    * caller's tiebreaker to a total order; `IvmSpec`-style invariant: the
    * merge equals a full recompute, which the oracle states directly.
    * Both cuts run on the bounded-heap TopKPerKey operator.
    */
  def topKMaintain(
      state: DataFrame, batch: DataFrame,
      keyCols: Seq[String], orderCols: Seq[String], k: Int): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
      state.unionByName(batch), keyCols, orderCols, k)

  /** Incremental maintenance of a DISTINCT-count view under insert-only
    * deltas: count(DISTINCT v) per key grows by exactly the number of
    * (key, v) pairs in the batch that the base has never seen —
    * Δdistinct = |π(ΔB) ∖ π(B)| — so a refresh costs one batch-sized
    * dedup plus a delta-keyed anti-join against the materialized pair
    * relation, never a corpus re-sweep (deletes additionally need the
    * refcounted pair state; insert-only streams — new users, new docs —
    * are the common case and need only membership). Emits per key the
    * old, added and new distinct counts; keys born in the batch appear
    * with old = 0. One pair-keyed shuffle per side; AQE broadcasts small
    * batches into the anti-join.
    */
  def distinctDelta(
      base: DataFrame, delta: DataFrame,
      keys: Seq[String], valueCol: String): DataFrame = {
    val cols = keys.map(col) :+ col(valueCol)
    val bp = base.select(cols: _*).distinct()
    val dp = delta.select(cols: _*).distinct()
    val old = bp.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("old_distinct"))
    val added = dp.join(bp, keys :+ valueCol, "left_anti")
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("added_distinct"))
    old.join(added, keys, "full_outer")
      .na.fill(0L, Seq("old_distinct", "added_distinct"))
      .withColumn("new_distinct", col("old_distinct") + col("added_distinct"))
  }
}
