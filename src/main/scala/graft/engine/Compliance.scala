package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Compliance-flavored closure operators over the config-declared FK graph —
  * the subsetter's traversal machinery pointed at a different question:
  * not "which rows must I KEEP for referential closure" but "which rows
  * must I DELETE so no dangling reference survives" (the GDPR/right-to-be-
  * forgotten cascade a warehouse runs before hard-deleting subjects).
  */
object Compliance {

  /** Per-table counts of the delete cascade from a seed predicate: every
    * row that transitively references a deleted row (child-ward closure
    * over the FK edges) must go too. `edges` are `(child, fkCol, parent,
    * pkCol)` in parent-before-child order (the subsetter's downstream
    * phase order — cycles are rejected upstream by FkGraph); a table
    * reachable through several edges accumulates the union of its deleted
    * rows, deduplicated on its primary key.
    *
    * Every hop is one semi-join of the child against the DISTINCT deleted
    * parent keys (dimension-sized side, broadcast at plan time) — the same
    * cost class as the subsetter's own closure phases; counts fold into
    * one lazy union plan, so a single action prices the whole cascade.
    */
  def deleteCascadeCounts(
      load: String => DataFrame,
      seedTable: String,
      seedPred: Column,
      pks: Map[String, Seq[String]],
      edges: Seq[(String, String, String, String)]): DataFrame = {
    val deleted = scala.collection.mutable.LinkedHashMap[String, DataFrame](
      seedTable -> load(seedTable).filter(seedPred))
    for ((child, fk, parent, pk) <- edges if deleted.contains(parent)) {
      val add = Ops.semiJoin(
        load(child), Seq(fk),
        deleted(parent).select(col(pk)).distinct(), Seq(pk))
      deleted(child) = deleted.get(child) match {
        case Some(d) => d.union(add).dropDuplicates(pks(child))
        case None => add
      }
    }
    deleted.toSeq
      .map { case (t, df) =>
        df.agg(count(lit(1)).as("n_rows_deleted"))
          .select(lit(t).as("table_name"), col("n_rows_deleted"))
      }
      .reduce(_ union _)
  }
}
