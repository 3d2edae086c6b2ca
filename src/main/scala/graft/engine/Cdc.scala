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
}
