package graft

import graft.analytics.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpecBase {

  import spark.implicits._

  /** Zipf-ish corpus: token i appears ~N/i times, so bigrams are heavily
    * skewed — a handful of hot pairs over a long rare tail.
    */
  private lazy val skewed = {
    val words = (1 to 40).flatMap(i => Seq.fill(80 / i)(s"w$i"))
    (0 until 60).map { d =>
      val txt = (0 until 50)
        .map(j => words(((d * 31 + j * 17) * 7919) % words.size))
        .mkString(" ")
      (d.toLong, txt)
    }.toDF("doc_id", "text")
  }

  private def naive(thresholdDen: Long) = {
    val grams = skewed
      .select(graft.functions.TextFunctions.tokens(col("text")).as("w"))
      .select(explode(graft.functions.TextFunctions.wordShingles(col("w"), 2))
        .as("gram"))
    val total = grams.count()
    grams.groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") * thresholdDen >= lit(total))
  }

  test("CMS-pruned heavy hitters equal the naive full groupBy") {
    for (den <- Seq(50L, 200L)) {
      val fast = Sketches.heavyHittersCms(skewed, thresholdDen = den)
      val slow = naive(den)
      assert(fast.count() == slow.count(), s"den=$den")
      assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty,
        s"den=$den")
    }
  }

  test("a tiny colliding sketch still gives the exact answer") {
    // w=2, d=1: nearly every gram collides, the estimate wildly
    // overcounts, the candidate set is almost the whole stream — and the
    // exact HAVING must still strip every false positive
    val fast = Sketches.heavyHittersCms(skewed, thresholdDen = 50L,
      d = 1, w = 2)
    val slow = naive(50L)
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("sketch estimates never undercount (no false negatives by design)") {
    // a generous sketch admits everything above threshold even when the
    // threshold sits at the single-occurrence floor
    val fast = Sketches.heavyHittersCms(skewed, thresholdDen = 1000000L)
    val slow = naive(1000000L)
    assert(fast.count() == slow.count())
  }

  test("kmvOverlapEval: unsaturated sketches are exact, estimates stay in range") {
    // vocabularies smaller than k: the k-min sketch IS the set, so the
    // estimate must equal the exact Jaccard for every pair
    val tiny = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "beta gamma epsilon", "s2"),
      (3L, "zeta eta beta", "s3"))
      .toDF("doc_id", "text", "source")
    val got = Sketches.kmvOverlapEval(tiny, k = 64).collect()
    // only overlapping pairs are emitted (inner join with the exact side)
    assert(got.length == 3)
    for (r <- got) {
      assert(r.getAs[Long]("err_bp") == 0L, r.toString)
      assert(r.getAs[Long]("est_jaccard_bp") ==
        r.getAs[Long]("exact_jaccard_bp"))
    }
    // s1 vs s2 share {beta, gamma} of 5 union tokens -> 4000 bp
    val s12 = got.find(r => r.getString(0) == "s1" && r.getString(1) == "s2").get
    assert(s12.getAs[Long]("exact_jaccard_bp") == 4000L)
    // saturated sketches on the fixture: estimates bounded, all pairs out
    val fix = Sketches.kmvOverlapEval(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(300), k = 16)
      .collect()
    assert(fix.nonEmpty)
    assert(fix.forall(r => r.getAs[Long]("est_jaccard_bp") >= 0 &&
      r.getAs[Long]("est_jaccard_bp") <= 10000))
  }

  test("cmsErrorEval: estimates never undercount; a wide sketch is exact") {
    // wide sketch: effectively collision-free on this vocabulary, so the
    // md5-variant estimate equals the exact count for every top gram
    val wide = Sketches.cmsErrorEval(skewed, d = 4, w = 1 << 20, topK = 10)
      .collect()
    assert(wide.length == 10)
    assert(wide.forall(_.getAs[Long]("overcount") == 0L), wide.mkString(","))
    // narrow sketch: collisions force overcounts, but NEVER undercounts,
    // and the exact counts are the same ground truth
    val narrow = Sketches.cmsErrorEval(skewed, d = 2, w = 16, topK = 10)
      .collect()
    assert(narrow.forall(_.getAs[Long]("overcount") >= 0L))
    assert(narrow.exists(_.getAs[Long]("overcount") > 0L))
    val wexact = wide.map(r => r.getString(0) -> r.getAs[Long]("n_exact")).toMap
    val nexact = narrow.map(r => r.getString(0) -> r.getAs[Long]("n_exact")).toMap
    assert(wexact == nexact)
  }

  test("histogram quantiles: exact rank edges, merge-by-union invariance") {
    val ten = (0 until 10).map(i => i / 10.0 + 0.05).toDF("value")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val got = asMap(Sketches.histogramQuantiles(ten))
    // n=10: p50 → rank 5 → bin 4; p90 → rank 9 → bin 8; p99 → rank 10 → bin 9
    assert(got == Map(50 -> ((5L, 4L, 0.4)), 90 -> ((9L, 8L, 0.8)),
      99 -> ((10L, 9L, 0.9))))
    // a sketch of a union is the sum of sketches: doubling the corpus
    // doubles every rank but the quantile edges are unchanged
    val doubled = asMap(Sketches.histogramQuantiles(ten.union(ten)))
    assert(doubled == Map(50 -> ((10L, 4L, 0.4)), 90 -> ((18L, 8L, 0.8)),
      99 -> ((20L, 9L, 0.9))))
  }
}
