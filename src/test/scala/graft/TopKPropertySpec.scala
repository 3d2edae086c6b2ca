package graft

import graft.plans.TopKPerKey
import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Property-style tests for the custom grouped-top-k operator: on random
  * datasets (deterministic seeds) with random k, skewed key distributions,
  * NULL keys and NULL order values, the result must equal the row_number
  * window formulation under the same total order.
  */
class TopKPropertySpec extends SparkSpecBase {

  private val schema = StructType(Seq(
    StructField("k1", LongType, nullable = true),
    StructField("v", LongType, nullable = true),
    StructField("uid", LongType, nullable = false)))

  private def genDf(n: Int, keyCard: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    val rows = (0 until n).map { i =>
      // skew: key 0 gets ~half the rows; ~5% NULL keys and NULL values
      val key =
        if (rnd.nextInt(20) == 0) null
        else if (rnd.nextBoolean()) Long.box(0L)
        else Long.box(rnd.nextInt(keyCard).toLong)
      val v = if (rnd.nextInt(20) == 0) null else Long.box(rnd.nextInt(50).toLong)
      Row(key, v, i.toLong)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("random datasets: equals row_number under a total order, incl. NULLs and skew") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed * 1000L)
      val n = 50 + rnd.nextInt(400)
      val keyCard = 1 + rnd.nextInt(12)
      val k = 1 + rnd.nextInt(6)
      val df = genDf(n, keyCard, seed)
      val got = TopKPerKey.topKPerKey(df, Seq("k1"), Seq("v", "uid"), k)
      val oracle = df
        .withColumn("rn", row_number().over(
          Window.partitionBy("k1").orderBy(col("v"), col("uid"))))
        .filter(col("rn") <= k).drop("rn")
      assert(got.count() == oracle.count(),
        s"seed=$seed n=$n keyCard=$keyCard k=$k: count mismatch")
      assert(got.exceptAll(oracle).count() == 0,
        s"seed=$seed n=$n keyCard=$keyCard k=$k: row mismatch")
    }
  }

  test("plan shows map-side partial top-k below the hash exchange") {
    val df = genDf(200, 8, seed = 42)
    val got = TopKPerKey.topKPerKey(df, Seq("k1"), Seq("v", "uid"), 3)
    val plan = got.queryExecution.executedPlan.toString
    // partial (pre-shuffle) and final instances, shuffle between them
    assert(plan.contains("TopKPerKeyPartial"), plan)
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    val iFinal = plan.indexOf("TopKPerKey\n") match {
      case -1 => plan.indexOf("TopKPerKey ")
      case i => i
    }
    val iExchange = plan.indexOf("Exchange hashpartitioning")
    assert(iFinal >= 0 && iExchange >= 0, plan)
    assert(iFinal < iExchange && iExchange < iPartial,
      s"expected final above exchange above partial:\n$plan")
  }

  /** Forces the sort-based fallback: a tiny row budget over high-cardinality
    * keys makes every task overflow its heap map; output must be identical
    * and the numFallbackTasks metric must record the switch.
    */
  test("sort fallback under a tiny row budget matches the heap path and fires the metric") {
    val budgetKey = graft.plans.TopKPerKey.RowBudgetKey
    spark.conf.set(budgetKey, "4")
    // AQE wraps the tree in AdaptiveSparkPlanExec (a leaf), which would
    // hide TopKPerKeyExec from the metric lookup below; save the prior
    // value rather than unsetting to the session default afterwards
    val priorAqe = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      for (seed <- 1 to 4) {
        val rnd = new scala.util.Random(seed * 77L)
        val n = 100 + rnd.nextInt(300)
        // high cardinality: most keys distinct, so k=1 buffers ~n rows
        val keyCard = 200
        val k = 1 + rnd.nextInt(3)
        val df = genDf(n, keyCard, seed)
        val got = TopKPerKey.topKPerKey(df, Seq("k1"), Seq("v", "uid"), k)
        val oracle = df
          .withColumn("rn", row_number().over(
            Window.partitionBy("k1").orderBy(col("v"), col("uid"))))
          .filter(col("rn") <= k).drop("rn")
        // collect() executes got's OWN plan (count/exceptAll build derived
        // plans whose exec nodes carry separate metric instances)
        val gotRows = got.collect().toSeq
        val oracleRows = oracle.collect().toSeq
        assert(gotRows.size == oracleRows.size,
          s"fallback seed=$seed n=$n k=$k: count mismatch")
        assert(gotRows.groupBy(identity).view.mapValues(_.size).toMap ==
          oracleRows.groupBy(identity).view.mapValues(_.size).toMap,
          s"fallback seed=$seed n=$n k=$k: row multiset mismatch")
        val fallbacks = got.queryExecution.executedPlan.collect {
          case e: graft.plans.TopKPerKeyExec => e.metrics("numFallbackTasks").value
        }.sum
        assert(fallbacks > 0,
          s"fallback seed=$seed: expected numFallbackTasks > 0 (budget did not trip)")
      }
    } finally {
      spark.conf.unset(budgetKey)
      priorAqe match {
        case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
        case None => spark.conf.unset("spark.sql.adaptive.enabled")
      }
    }
  }

  test("fallback handles composite keys with NULLs and k past group sizes") {
    val budgetKey = graft.plans.TopKPerKey.RowBudgetKey
    spark.conf.set(budgetKey, "2")
    try {
      val df = genDf(300, 150, seed = 9)
        .withColumn("k2", col("uid") % 7)
      val got = TopKPerKey.topKPerKey(df, Seq("k1", "k2"), Seq("v", "uid"), 5)
      val oracle = df
        .withColumn("rn", row_number().over(
          Window.partitionBy("k1", "k2").orderBy(col("v"), col("uid"))))
        .filter(col("rn") <= 5).drop("rn")
      assert(got.count() == oracle.count())
      assert(got.exceptAll(oracle).count() == 0)
    } finally spark.conf.unset(budgetKey)
  }
}
