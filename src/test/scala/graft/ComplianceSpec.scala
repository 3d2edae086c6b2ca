package graft

import graft.engine.Compliance
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class ComplianceSpec extends SparkSpecBase {

  test("delete cascade: diamond reachability dedups on the child pk") {
    // users 1,2; posts P10(u1) P11(u2); comments reference BOTH a post and
    // a user, so deleting u1 reaches c100 twice (directly and via P10) —
    // it must count once — and c101 only via its post
    val users = spark.createDataFrame(Seq(Row(1L), Row(2L)).asJava,
      StructType(Seq(StructField("u_id", LongType))))
    val posts = spark.createDataFrame(
      Seq(Row(10L, 1L), Row(11L, 2L)).asJava,
      StructType(Seq(StructField("p_id", LongType),
        StructField("p_user", LongType))))
    val comments = spark.createDataFrame(
      Seq(Row(100L, 10L, 1L), Row(101L, 10L, 2L), Row(102L, 11L, 2L)).asJava,
      StructType(Seq(StructField("c_id", LongType),
        StructField("c_post", LongType), StructField("c_user", LongType))))
    val tables = Map("users" -> users, "posts" -> posts,
      "comments" -> comments)
    val got = Compliance.deleteCascadeCounts(
      tables(_), "users", col("u_id") === 1L,
      Map("posts" -> Seq("p_id"), "comments" -> Seq("c_id")),
      Seq(("posts", "p_user", "users", "u_id"),
        ("comments", "c_user", "users", "u_id"),
        ("comments", "c_post", "posts", "p_id")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // u1 -> post P10 -> comments {100 direct-by-user, 100+101 via post}
    assert(got == Map("users" -> 1L, "posts" -> 1L, "comments" -> 2L))
  }

  test("delete cascade on the fixture equals the stated closure") {
    val dir = sfDir
    def load(n: String) = spark.read.parquet(s"$dir/$n.parquet")
    val got = Compliance.deleteCascadeCounts(
      load, "customer", col("c_custkey") % 10 === 7,
      Map("orders" -> Seq("o_orderkey"),
        "lineitem" -> Seq("l_orderkey", "l_linenumber")),
      Seq(("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val delCust = load("customer").filter(col("c_custkey") % 10 === 7)
    val delOrders = load("orders").join(delCust.select(col("c_custkey")),
      col("o_custkey") === col("c_custkey"), "left_semi")
    val delLi = load("lineitem").join(delOrders.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(got("customer") == delCust.count())
    assert(got("orders") == delOrders.count())
    assert(got("lineitem") == delLi.count())
    assert(got("orders") > 0 && got("lineitem") > 0)
  }
}
