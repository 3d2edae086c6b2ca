package graft

import graft.analytics.Privacy
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpecBase {

  private lazy val customer = spark.read.parquet(s"$sfDir/customer.parquet")
  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")

  test("pseudonymization is FK-consistent: orders join customers orphan-free after masking") {
    val custTok = customer
      .select(Privacy.pseudonym(col("c_custkey"), "p", "C#").as("tok"))
    val ordTok = orders
      .select(Privacy.pseudonym(col("o_custkey"), "p", "C#").as("tok"))
    // the property redaction destroys and pseudonymization preserves
    assert(ordTok.join(custTok.distinct(), Seq("tok"), "left_anti").count() == 0)
    // injective on the fixture id range: masking never merges two customers
    assert(custTok.distinct().count() ==
      customer.select("c_custkey").distinct().count())
    // a different pepper yields a disjoint token space (no cross-release linkage)
    val other = customer
      .select(Privacy.pseudonym(col("c_custkey"), "q", "C#").as("tok"))
    assert(custTok.join(other, Seq("tok")).count() == 0)
  }

  test("generalization ladder: coarse k dominates fine k") {
    val ladder = Privacy.generalizationLadder(customer,
      Seq(col("c_nationkey"), col("c_mktsegment")),
      floor(col("c_acctbal") / 1000).cast("long"),
      floor(col("c_acctbal") / 5000).cast("long"))
    assert(ladder.count() > 0)
    assert(ladder.filter(col("k_coarse") < col("k_fine")).count() == 0)
  }

  test("k-anonymity report: group sizes cover the table, flag matches threshold") {
    val rep = Privacy.kAnonymityReport(customer,
      Seq(col("c_nationkey"), col("c_mktsegment")))
    assert(rep.agg(sum("k")).head.getLong(0) == customer.count())
    assert(rep.filter((col("k") < 5) =!= (col("below") === 1)).count() == 0)
  }
}
