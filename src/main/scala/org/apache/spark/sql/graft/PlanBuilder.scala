package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one-line bridge extension libraries need: turn a hand-built
  * `LogicalPlan` back into a `DataFrame`. `Dataset.ofRows` is
  * `private[sql]`, so this object lives under `org.apache.spark.sql` —
  * the same technique Spark-ecosystem extensions use to expose custom
  * operators without forking Spark.
  */
object PlanBuilder {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** `private[spark]` members custom physical operators legitimately need at
  * task runtime, re-exposed from inside the `org.apache.spark` namespace.
  */
object SparkInternals {
  /** The memory-manager page size an external sorter should allocate with
    * (what `SortExec` passes to `UnsafeExternalRowSorter.create`). Callable
    * on the executor inside a task.
    */
  def pageSizeBytes: Long = org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes
}
