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
}
