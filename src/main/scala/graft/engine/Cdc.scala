package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: MERGE a change batch (full-row images
  * tagged I/U/D with a sequence number) into a keyed snapshot — the
  * upsert/delete operator warehouses call `MERGE INTO` and lakehouse
  * formats implement natively, expressed as one co-partitioned outer
  * join so it runs on plain parquet. The reference product's world is
  * database snapshots (`/root/reference/subset.py` reads live tables);
  * a pipeline refreshing those snapshots incrementally applies exactly
  * this operator instead of re-copying the table.
  *
  * Semantics (standard CDC compaction + apply):
  *   - per key, ONLY the latest change by `seqCol` applies (earlier ops
  *     in the same batch are superseded — a window row_number dedup, not
  *     a groupBy, so the full row image survives);
  *   - latest op D  → the key disappears from the result;
  *   - latest op I/U → the change's row image replaces (or inserts) the
  *     snapshot row;
  *   - keys without changes pass through untouched.
  *
  * Scale shape: the snapshot and the compacted batch shuffle once each
  * on the merge key into the same join; nothing is collected, and the
  * change batch is typically ≪ snapshot so AQE broadcasts it. Result
  * column order is the snapshot's. Deterministic: `seqCol` must totally
  * order changes within a key (the caller's CDC log position); ties are
  * rejected nowhere but produce nondeterminism, so the spec pins
  * uniqueness in the fixtures.
  */
object Cdc {

  def mergeApply(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    require(dataCols.contains(keyCol), s"snapshot lacks key column $keyCol")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    // compacted batch, columns prefixed so the merge join is unambiguous
    // even when changes derive from the snapshot's own lineage
    val latest = changes
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(dataCols.map(c => col(c).as(s"_ch_$c"))
        :+ col(opCol).as("_op"): _*)
    snapshot
      .join(latest, col(keyCol) === col(s"_ch_$keyCol"), "full_outer")
      .filter(coalesce(col("_op"), lit("keep")) =!= "D")
      .select(dataCols.map { c =>
        if (c == keyCol) coalesce(col(keyCol), col(s"_ch_$keyCol")).as(keyCol)
        else when(col("_op").isNotNull, col(s"_ch_$c")).otherwise(col(c)).as(c)
      }: _*)
  }

  /** SCD Type-2 history build from a CDC change stream — the
    * slowly-changing-dimension table a warehouse maintains so "what did
    * this row look like at sequence s?" is one range predicate
    * (Kimball's type-2 dimension; the BUILD side of the repo's
    * `events_scd2_*` query keys). Every I/U change opens a version
    * valid from its own sequence number; the NEXT change on the key —
    * any op, including the delete that closes without opening — ends
    * it. `valid_to_seq` is NULL on the open version and `is_current`
    * marks it, unless the key's last change is a D (deleted keys have
    * no current version).
    *
    * One key-partitioned window (lead over the per-key change order)
    * and a filter — no join, no state: the change stream shuffles once
    * on the key, which is exactly the MERGE key the apply side
    * shuffles on, so history build and snapshot apply co-partition in
    * one pipeline at any scale.
    */
  def scd2Build(
      changes: DataFrame,
      keyCol: String,
      seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    val dataCols =
      changes.columns.toSeq.filterNot(c => c == seqCol || c == opCol)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol))
    changes
      .withColumn("_vt", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .select(dataCols.map(col) ++ Seq(
        col(seqCol).cast("long").as("valid_from_seq"),
        col("_vt").cast("long").as("valid_to_seq"),
        col("_vt").isNull.cast("int").as("is_current")): _*)
  }
}
