package graft

import graft.functions.{GraftExtensions, NativeExpressions}
import org.apache.spark.sql.functions._

class NativeExpressionsSpec extends SparkSpecBase {

  test("float_dot matches the decimal HOF formulation to 1e-9") {
    NativeExpressions.register(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
    val both = emb.select(
      expr("float_dot(embedding, embedding)").as("fast"),
      graft.functions.VectorFunctions.normSqDecimal(col("embedding"))
        .cast("double").as("exact"))
    assert(both.collect().forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("hamming counts differing positions") {
    NativeExpressions.register(spark)
    import spark.implicits._
    val rows = Seq(("1100", "1010"), ("abc", "abc"), ("", "xx"))
      .toDF("a", "b")
      .select(expr("hamming(a, b)")).collect().map(_.getInt(0))
    assert(rows.toSeq == Seq(2, 0, 2))
  }

  test("type checking rejects wrong argument types") {
    NativeExpressions.register(spark)
    import spark.implicits._
    val e = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b").select(expr("float_dot(a, b)")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("float"))
  }

  test("GraftExtensions registers both functions into an extensions object") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw
    val s2 = spark.newSession()
    NativeExpressions.register(s2)
    assert(s2.sql("SELECT hamming('10', '11') AS h").head.getInt(0) == 1)
  }
}
