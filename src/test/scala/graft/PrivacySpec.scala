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

  test("t-closeness: hand-computed ordered EMD, skewed group flagged") {
    import spark.implicits._
    // global over 2 bins: bin0 ×2, bin1 ×4 (N=6). Group A(4): 0,0,1,1 —
    // sad = |2·6−2·4| = 4 → 40000 div 24 = 1666. Group B(2): 1,1 —
    // sad = |0·6−2·2| = 4 → 40000 div 12 = 3333 > t=2000.
    val df = Seq(("A", 0), ("A", 0), ("A", 1), ("A", 1), ("B", 1), ("B", 1))
      .toDF("seg", "b")
    val got = Privacy.tClosenessReport(df, col("seg"), col("b"), nBins = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getInt(3)))).toMap
    assert(got == Map("A" -> ((4L, 1666L, 0)), "B" -> ((2L, 3333L, 1))))
    // a group distributed like the global distribution has EMD exactly 0
    val uni = Seq(("A", 0), ("A", 1), ("B", 0), ("B", 1)).toDF("seg", "b")
    val zero = Privacy.tClosenessReport(uni, col("seg"), col("b"), nBins = 2)
      .collect().map(_.getLong(2)).toSeq
    assert(zero == Seq(0L, 0L))
  }

  test("Mondrian: hand median cuts split 1..8 into singleton leaves; ties never split") {
    import spark.implicits._
    // x = 1..8, y = x mod 2: every cut lands exactly between two values
    val df = (1 to 8).map(x => (x.toLong, (x % 2).toLong)).toDF("x", "y")
    val got = Privacy.mondrianPartitions(df, col("x"), col("y"), k = 2L)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7))))
      .toMap
    assert(got.size == 8)
    // leaf (r1, r2, r3) holds exactly one row; spot-check the corners
    assert(got((0, 0, 0)) == ((1L, 2L, 2L, 1L, 0L.toInt)))
    assert(got((1, 1, 1)) == ((1L, 7L, 7L, 1L, 0)))
    assert(got.values.forall { case (n, _, _, _, kanon) =>
      n == 1L && kanon == 0 })
    // all-ties numeric column: the x cuts are no-ops, only the y cut
    // fires, and both leaves clear k = 2
    val ties = Seq((5L, 0L), (5L, 1L), (5L, 2L), (5L, 3L)).toDF("x", "y")
    val got2 = Privacy.mondrianPartitions(ties, col("x"), col("y"), k = 2L)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        ((r.getLong(3), r.getInt(7)))).toMap
    assert(got2 == Map((0, 0, 0) -> ((2L, 1)), (0, 1, 0) -> ((2L, 1))))
  }

  test("DP geometric counts: noise replays the frozen CDF ladder") {
    import spark.implicits._
    val df = (Seq.fill(3)(0) ++ Seq.fill(7)(1) ++ Seq.fill(1)(2))
      .map(k => (k, "x")).toDF("grp", "pad")
    val thresholds = Seq(5592405L -> 0L, 8388608L -> 1L, 11184810L -> -1L,
      12582912L -> 2L, 13981013L -> -2L, 14680064L -> 3L,
      15379114L -> -3L, 15728640L -> 4L, 16078165L -> -4L)
    def noise(key: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"dp-r16:$key".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      val u = java.lang.Long.parseLong(hex, 16)
      thresholds.find(u < _._1).map(_._2).getOrElse(5L)
    }
    val trueN = Map(0 -> 3L, 1 -> 7L, 2 -> 1L)
    val got = Privacy.dpGeometricCounts(df, "grp").collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(3), r.getLong(4))))
      .toMap
    trueN.foreach { case (k, n) =>
      val kn = noise(k)
      assert(got(k) == ((n, kn, math.max(0L, n + kn))),
        s"key $k: got ${got(k)}, noise $kn")
    }
  }
}
