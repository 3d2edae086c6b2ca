package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator — the whole-operator extension
  * tier (custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`), for the one
  * shape the built-ins can't plan efficiently: "first k rows per key" via
  * `row_number().over(Window...)` + filter sorts EVERY group's rows
  * (O(n log n) per group, full materialization in the window buffer), while
  * this operator keeps a bounded k-element heap per key (O(n log k), O(keys
  * per partition × k) memory, no sort buffer to spill).
  *
  * Scale shape: `requiredChildDistribution = ClusteredDistribution(keys)`
  * tells the planner to hash-shuffle the input on the keys (or reuse an
  * existing compatible partitioning — e.g. bucketed storage ⇒ NO shuffle);
  * the heaps then run partition-local with nothing crossing the driver.
  *
  * The reference has no such operator (its LIMIT is global, per generated
  * query — /root/reference/subset.py:75-76); this is the per-group form a
  * training-data pipeline needs ("first k events per user", "best k
  * candidates per bucket").
  */
case class TopKPerKey(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"topKPerKey: k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans the logical node; `planLater` leaves the child to the normal
  * planner, so filters/pruning below the top-k still push into the scan.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // co-locate each key's rows; an already-compatible child partitioning
  // (bucketing, prior aggregate on the same keys) satisfies this with no
  // exchange
  override def requiredChildDistribution: Seq[Distribution] =
    if (keyExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keyExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keys = keyExprs
    val ord = order
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keys, schema)
      // codegen'd comparator over the sort order, bound to the child schema
      val rowOrd = GenerateOrdering.generate(ord, schema)
      // max-heap per key: head is the WORST of the current best k, so each
      // new row needs one comparison against the head in the common case.
      // Rows are stored via copy() — child rows may be reused UnsafeRows or
      // any other InternalRow (cache, AQE reuse), so no concrete type is
      // assumed.
      val heaps = new java.util.HashMap[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      val heapOrd: Ordering[InternalRow] = (a, b) => rowOrd.compare(a, b)
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var q = heaps.get(key)
        if (q == null) {
          q = scala.collection.mutable.PriorityQueue.empty[InternalRow](heapOrd)
          heaps.put(key.copy(), q)
        }
        if (q.size < kk) q.enqueue(row.copy())
        else if (rowOrd.compare(row, q.head) < 0) {
          q.dequeue()
          q.enqueue(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.iterator.asScala.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKey {

  /** DataFrame API: the k smallest rows per key under `orderCols` ascending
    * (extend the column list with a tiebreaker to make the order total —
    * otherwise rank-k ties are implementation-defined, same as
    * `row_number`). Registers the strategy in the session on first use.
    */
  /** Register the strategy (and the row_number rewrite rule) in a session
    * built without `GraftExtensions` — `experimental` is the public escape
    * hatch for both.
    *
    * SESSION-WIDE side effect: once installed, every `row_number() ≤ k`
    * idiom in the session plans through [[TopKPerKeyExec]] (identical
    * results under a total order; rank-k ties — implementation-defined in
    * both forms — may resolve differently). [[topKPerKey]] installs
    * implicitly on first use; sessions that must not be touched should plan
    * with a separate `spark.newSession()`. Synchronized: the check-then-
    * append below must not race a concurrent first use.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    if (!spark.experimental.extraOptimizations.contains(RowNumberTopKRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RowNumberTopKRewrite
  }

  def topKPerKey(
      df: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[String],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val plan = df.queryExecution.analyzed
    def resolve(name: String): Attribute =
      plan.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"topKPerKey: column '$name' not in ${plan.output.map(_.name)}"))
    org.apache.spark.sql.graft.PlanBuilder.ofRows(spark,
      TopKPerKey(
        keyCols.map(resolve),
        orderCols.map(c => SortOrder(resolve(c), Ascending)),
        k, plan))
  }
}
