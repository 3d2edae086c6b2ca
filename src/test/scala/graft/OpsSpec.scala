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

  test("stratified sample equals the CASE predicate and thins each stratum") {
    import org.apache.spark.sql.functions.expr
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = graft.engine.Ops.stratifiedSample(
      docs, "lang", "doc_id", Map("en" -> 2), defaultDen = 5)
    val oracle = docs.filter(expr(
      "CASE WHEN lang = 'en' THEN doc_id % 2 = 0 ELSE doc_id % 5 = 0 END"))
    assert(got.count() == oracle.count())
    assert(got.exceptAll(oracle).count() == 0)
    // en kept at roughly half, others at roughly a fifth
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val src = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") * 10 > src("en") * 3 && byLang("en") * 10 < src("en") * 7)
    for ((l, n) <- byLang if l != "en")
      assert(n * 10 < src(l) * 4, s"lang $l kept $n of ${src(l)}")
  }

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

  test("approx_count_distinct lands within 5% of the exact cardinality") {
    // approx_distinct_parts is the one rows-only CORRECTNESS key (sketch
    // values are estimator-specific, so no DuckDB hash) — this ratio band
    // is its correctness statement: the HLL++ estimate must track the
    // exact distinct count within the default 5% rsd
    import org.apache.spark.sql.functions.{approx_count_distinct, col, countDistinct}
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val r = li.agg(
      approx_count_distinct(col("l_partkey")).as("a"),
      countDistinct(col("l_partkey")).as("e")).head
    val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(a - e) / e <= 0.05, s"approx $a vs exact $e")
  }

  test("deterministicSample is a pure key-mod filter") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val n = Ops.deterministicSample(orders, "o_orderkey", 10).count()
    assert(n == orders.filter("o_orderkey % 10 = 0").count())
  }

  test("asofJoin: latest right at-or-before each left, nulls before any right") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (2L, 5L, "l3"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, 10L, "r@10"), (1L, 15L, "r@15"), (1L, 25L, "r@25"),
      (2L, 9L, "r@9"))
      .toDF("k", "ts", "rv")
    val got = Ops.asofJoin(left, right, Seq("k"), "ts", "ts",
      payload = Seq("rv"), tieBreak = Seq("ts"))
      .select("lv", "asof_rv").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("l1").contains("r@10")) // equal ts matches (<= semantics)
    assert(got("l2").contains("r@15")) // latest prior, not the future r@25
    assert(got("l3").isEmpty)          // no right at-or-before → null
  }

  test("rangeJoinBinned equals the naive theta-join and plans no nested loop") {
    import spark.implicits._
    // random points and intervals spanning 0..10 bins at binWidth=100,
    // interval spans 0..3 bins (incl. empty and point intervals)
    val rnd = new scala.util.Random(42)
    val points = (1 to 300).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "t")
    val ivs = (1 to 40).map { i =>
      val lo = rnd.nextInt(1000).toLong
      (i.toLong, lo, lo + rnd.nextInt(300))
    }.toDF("iid", "lo", "hi")
    val got = Ops.rangeJoinBinned(points, "t", ivs, "lo", "hi", binWidth = 100)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = points.crossJoin(ivs)
      .filter(org.apache.spark.sql.functions.col("t") >= org.apache.spark.sql.functions.col("lo") &&
        org.apache.spark.sql.functions.col("t") <= org.apache.spark.sql.functions.col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == naive.sorted.toSeq,
      s"range-join mismatch: got ${got.length} pairs, naive ${naive.length}")
    // exactly-once: no duplicate pairs even for multi-bin intervals
    assert(got.distinct.length == got.length, "duplicate (point, interval) pair")
    // the rewrite's point: an equi-join shuffle, not a nested loop
    val plan = Ops.rangeJoinBinned(points, "t", ivs, "lo", "hi", binWidth = 100)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
  }

  test("saltedJoin composite keys preserve plain-join semantics") {
    val got = Ops.saltedJoin(left, Seq("a", "b"), target.toDF("a", "b"),
      Seq("a", "b"), saltN = 4)
    assert(got.count() == 2) // (1,1,x) and (2,1,z) match
  }

  test("saltedJoin is bit-stable across runs and spreads a hot key") {
    import spark.implicits._
    // one hot key (1) carrying 400 distinct rows, one cold key
    val big = (0 until 400).map(i => (1L, s"p$i")) :+ (2L, "cold")
    val bigDf = big.toDF("k", "payload").repartition(7)
    val small = Seq((1L, "dim1"), (2L, "dim2")).toDF("k", "dv")
    def run() = Ops.saltedJoin(bigDf, Seq("k"), small, Seq("k"), saltN = 8)
      .select("k", "payload", "dv").collect().map(_.toSeq).toSet
    val r1 = run()
    // identical output across two runs (hash salt, not rand: partition
    // layout and task retries cannot change row routing)
    assert(r1 == run())
    assert(r1.size == 401)
    // the hot key's rows actually fan out over several salt values
    val salts = bigDf.filter($"k" === 1L)
      .withColumn("s", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash(
          $"k", $"payload", org.apache.spark.sql.functions.lit(42L)),
        org.apache.spark.sql.functions.lit(8)))
      .select("s").distinct().count()
    assert(salts >= 4, s"hot key used only $salts of 8 salt buckets")
  }

  test("asofJoin forward: earliest right at-or-after each left, null when none follows") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val left = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("k", "t", "lid")
    val right = Seq((1L, 10L, 900L), (1L, 20L, 901L), (1L, 24L, 902L))
      .toDF("k", "t", "rid")
    val out = Ops.asofJoin(left, right, Seq("k"), "t", "t",
      payload = Seq("rid"), tieBreak = Seq("rid"), direction = "forward")
      .select(col("lid"), col("asof_rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(100L) == 900L) // equal ts qualifies (>=)
    assert(out(101L) == -1L)  // nothing at/after 25
    assert(out(102L) == -1L)  // key 2 has no right rows
    // backward on the same data still picks the latest at-or-before
    val back = Ops.asofJoin(left, right, Seq("k"), "t", "t",
      payload = Seq("rid"), tieBreak = Seq("rid"))
      .select(col("lid"), col("asof_rid")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(back(101L) == 902L)
  }

  test("percentSample is seeded-reproducible and in a sane band") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val n1 = Ops.percentSample(orders, 10.0, seed = 7).count()
    val n2 = Ops.percentSample(orders, 10.0, seed = 7).count()
    assert(n1 == n2)
    assert(n1 > 50 && n1 < 350) // 10% of 1500 ± wide band
  }

  test("ntileBuckets reproduces SQL NTILE exactly, including the remainder rule") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, ntile}
    // 13 rows, k=5: q=2, r=3 → buckets sized 3,3,3,2,2; keys shuffled in
    // input order so the ranking must come from the sort, not arrival
    val df = Seq(7, 1, 12, 3, 9, 0, 11, 5, 2, 10, 4, 8, 6)
      .map(i => (i.toLong * 10, i.toLong)).toDF("k", "id")
    val got = Ops.ntileBuckets(df, "k", "id", k = 5, boundsPow2 = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val ref = df.withColumn("b",
        ntile(5).over(Window.orderBy(col("k"), col("id"))))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(got == ref)
    assert(got.values.groupBy(identity).view.mapValues(_.size).toMap ==
      Map(1 -> 3, 2 -> 3, 3 -> 3, 4 -> 2, 5 -> 2))
    // n < k: every row its own bucket, numbered from 1 by rank
    val small = Seq((30L, 1L), (10L, 2L), (20L, 3L)).toDF("k", "id")
    val gotSmall = Ops.ntileBuckets(small, "k", "id", k = 5, boundsPow2 = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(gotSmall == Map(10L -> 1, 20L -> 2, 30L -> 3))
  }
}
