package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom grouped-top-k operator must equal the row_number window
  * formulation on every input shape, and its plan must show the bounded-heap
  * exec (not a window sort).
  */
class TopKPerKeySpec extends SparkSpecBase {

  private lazy val events = spark.read.parquet(s"$sfDir/events.parquet")

  private def windowTopK(k: Int) =
    events
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= k)
      .select("user_id", "event_id")

  test("equals the row_number window formulation for k = 1, 3, 10") {
    for (k <- Seq(1, 3, 10)) {
      val got = TopKPerKey.topKPerKey(
        events, Seq("user_id"), Seq("ts", "event_id"), k)
        .select("user_id", "event_id")
      assert(got.count() == windowTopK(k).count(), s"count mismatch k=$k")
      assert(got.exceptAll(windowTopK(k)).count() == 0, s"rows mismatch k=$k")
    }
  }

  test("k larger than every group passes all rows through") {
    val got = TopKPerKey.topKPerKey(
      events, Seq("user_id"), Seq("ts", "event_id"), 1000000)
    assert(got.count() == events.count())
  }

  test("physical plan uses TopKPerKeyExec with a single hash exchange") {
    val df = TopKPerKey.topKPerKey(
      events, Seq("user_id"), Seq("ts", "event_id"), 3)
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(plan.contains("TopKPerKey"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("Window"), "must not fall back to a window sort")
  }

  test("composite keys and empty input") {
    val got = TopKPerKey.topKPerKey(
      events, Seq("user_id", "event_type"), Seq("ts", "event_id"), 2)
    val oracle = events
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id", "event_type")
          .orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= 2).drop("rn")
    assert(got.count() == oracle.count())
    val empty = TopKPerKey.topKPerKey(
      events.filter(lit(false)), Seq("user_id"), Seq("ts"), 3)
    assert(empty.count() == 0)
  }

  test("optimizer rule rewrites the row_number window idiom to TopKPerKey") {
    TopKPerKey.install(spark)
    val idiom = events
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id")
    val plan = idiom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    // no window exec ("Window [") and no residual group-limit either
    assert(!plan.contains("Window ["), plan)
    assert(!plan.contains("WindowGroupLimit"), plan)
    // and the rewritten plan still returns the window answer
    val direct = TopKPerKey.topKPerKey(
      events, Seq("user_id"), Seq("ts", "event_id"), 3)
      .select("user_id", "event_id")
    assert(idiom.exceptAll(direct).count() == 0)
    assert(idiom.count() == direct.count())
  }

  test("rewrite does NOT fire when rank is kept or function is rank()") {
    TopKPerKey.install(spark)
    val keepsRn = events
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("rn") <= 3)
      .select("user_id", "event_id", "rn")
    assert(keepsRn.queryExecution.executedPlan.toString.contains("Window"))
    val usesRank = events
      .withColumn("rk", rank().over(
        Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))))
      .filter(col("rk") <= 3)
      .select("user_id", "event_id")
    assert(usesRank.queryExecution.executedPlan.toString.contains("Window"))
  }

  test("descending order through the rewrite keeps the k largest") {
    TopKPerKey.install(spark)
    val idiom = events
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("value").desc, col("event_id"))))
      .filter(col("rn") <= 2)
      .select("user_id", "event_id")
    assert(idiom.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    val got = idiom.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // oracle: the same window query with the rewrite UNinstalled
    val saved = spark.experimental.extraOptimizations
    val oracle =
      try {
        spark.experimental.extraOptimizations = Nil
        events
          .withColumn("rn", row_number().over(
            Window.partitionBy("user_id")
              .orderBy(col("value").desc, col("event_id"))))
          .filter(col("rn") <= 2)
          .select("user_id", "event_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally spark.experimental.extraOptimizations = saved
    assert(got == oracle)
  }

  test("works over a cached (columnar InMemoryRelation) child") {
    val cached = events.cache()
    try {
      val got = TopKPerKey.topKPerKey(
        cached, Seq("user_id"), Seq("ts", "event_id"), 3)
        .select("user_id", "event_id")
      assert(got.count() == windowTopK(3).count())
      assert(got.exceptAll(windowTopK(3)).count() == 0)
    } finally cached.unpersist()
  }

  test("unknown column raises a friendly error") {
    val e = intercept[IllegalArgumentException] {
      TopKPerKey.topKPerKey(events, Seq("nope"), Seq("ts"), 3)
    }
    assert(e.getMessage.contains("nope"))
  }
}
