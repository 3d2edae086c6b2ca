package graft

import graft.queries.{CoreQueries, ExtensionQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan contracts for the scan path — the properties that decide
  * the cost at 100 TB: filters must reach the parquet reader
  * (PushedFilters), projections must prune the read schema (ReadSchema),
  * and dimension-sized join sides must broadcast, all WITHOUT hints having
  * to force them.
  */
class PushdownSpec extends SparkSpecBase {

  private def planOf(df: DataFrame): String =
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))

  private def key(name: String): DataFrame =
    (CoreQueries.queries ++ ExtensionQueries.queries)(name)(spark, sfDir)

  test("q6 pushes its range predicates into the parquet scan") {
    val plan = planOf(key("q6_forecast_revenue"))
    // the shipdate/discount/quantity filters appear as PushedFilters on
    // the scan node, not only as a post-scan Filter
    assert(plan.contains("PushedFilters:"), plan.take(800))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(pushed.contains("l_shipdate") || pushed.contains("l_quantity"),
      pushed)
  }

  test("projected scans prune the parquet read schema to the used columns") {
    val plan = planOf(key("doc_fingerprint"))
    val readSchema = plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(readSchema.contains("doc_id") && readSchema.contains("text"),
      readSchema)
    // the unused wide columns never reach the reader
    assert(!readSchema.contains("n_chars") && !readSchema.contains("lang"),
      readSchema)
  }

  test("dimension-sized join sides broadcast without hints") {
    // region/nation are KB-sized: the planner must pick broadcast-hash
    // joins on its own statistics, not fall back to sort-merge
    val plan = planOf(key("fk_metadata_join"))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), plan.take(1200))
  }

  test("pre-partitioned join sides introduce no third exchange") {
    import org.apache.spark.sql.functions.col
    // both sides already hash-partitioned on the join key at the session
    // shuffle parallelism: the sort-merge join must reuse that
    // distribution instead of re-shuffling — the co-location contract a
    // bucketed-table layout relies on at 100 TB
    // force the shuffle join (the fixture dim is broadcast-sized; at the
    // scale this contract matters the sides are not)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
        .repartition(col("o_orderkey"))
      val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .repartition(col("l_orderkey"))
      val plan = planOf(o.join(l, col("o_orderkey") === col("l_orderkey")))
      val exchanges = plan.linesIterator
        .count(_.matches("""\(\d+\) Exchange.*"""))
      assert(exchanges == 2, s"expected the two repartitions only:\n" +
        plan.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("whole-stage codegen covers the hot scan-filter-project pipeline") {
    // formatted mode hides codegen under AdaptiveSparkPlan pre-execution;
    // codegen mode compiles the stages directly
    val plan = key("q6_forecast_revenue").queryExecution
      .explainString(ExplainMode.fromString("codegen"))
    assert(plan.contains("WholeStageCodegen"), plan.take(800))
  }
}
