package graft

import graft.engine.Ops
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Composite-key and NULL-semantics tests for the join primitives — the
  * fixtures are single-key, so these use synthetic two-column keys
  * (SURVEY.md §7.3 item 4).
  */
class OpsSpec extends SparkSpecBase {
  import scala.jdk.CollectionConverters._

  private lazy val schema = StructType(Seq(
    StructField("a", IntegerType), StructField("b", IntegerType),
    StructField("v", StringType)))
  private lazy val left = spark.createDataFrame(
    Seq(
      Row(1, 1, "x"), Row(1, 2, "y"), Row(2, 1, "z"),
      Row(null, 1, "n1"), Row(2, null, "n2")).asJava,
    schema)
  private lazy val targetSchema = StructType(Seq(
    StructField("p", IntegerType), StructField("q", IntegerType)))
  private lazy val target = spark.createDataFrame(
    Seq(Row(1, 1), Row(2, 1)).asJava, targetSchema)

  test("composite-key semi-join keeps only matching tuples, drops NULL keys") {
    val got = Ops.semiJoin(left, Seq("a", "b"), target, Seq("p", "q"))
      .select("v").collect().map(_.getString(0)).toSet
    assert(got == Set("x", "z"))
  }

  test("composite-key anti-join keeps non-matching incl. NULL-key rows") {
    val got = Ops.antiJoin(left, Seq("a", "b"), target, Seq("p", "q"))
      .select("v").collect().map(_.getString(0)).toSet
    assert(got == Set("y", "n1", "n2"))
  }

  test("missingIds drops NULL tuples, dedups, renames to target cols") {
    val missing = Ops.missingIds(left, Seq("a", "b"), target, Seq("p", "q"))
    assert(missing.columns.toSeq == Seq("p", "q"))
    val got = missing.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got == Set((1, 2))) // (1,1),(2,1) exist; NULL tuples dropped
  }

  test("nullOutColumns preserves schema, order and types") {
    val out = Ops.nullOutColumns(left, Set("b"))
    assert(out.schema.fieldNames.toSeq == Seq("a", "b", "v"))
    assert(out.schema("b").dataType == IntegerType)
    assert(out.collect().forall(_.isNullAt(1)))
  }

  test("orphanScrub NULLs only unmatched composite FK tuples") {
    val scrubbed = Ops.orphanScrub(left, Seq("a", "b"), target, Seq("p", "q"))
    val byV = scrubbed.collect().map(r => r.getString(2) ->
      (if (r.isNullAt(0)) None else Some(r.getInt(0)))).toMap
    assert(byV("x").contains(1)) // (1,1) present in target → kept
    assert(byV("y").isEmpty)     // (1,2) absent → scrubbed
    assert(byV("n1").isEmpty)    // NULL key → no match → scrubbed
  }

  test("deterministicSample is a pure key-mod filter") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val n = Ops.deterministicSample(orders, "o_orderkey", 10).count()
    assert(n == orders.filter("o_orderkey % 10 = 0").count())
  }

  test("percentSample is seeded-reproducible and in a sane band") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val n1 = Ops.percentSample(orders, 10.0, seed = 7).count()
    val n2 = Ops.percentSample(orders, 10.0, seed = 7).count()
    assert(n1 == n2)
    assert(n1 > 50 && n1 < 350) // 10% of 1500 ± wide band
  }
}
