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
