package graft

import graft.analytics.{DataQuality, EventsAnalytics}

class SkewFunnelSpec extends SparkSpecBase {
  import spark.implicits._

  test("joinSkewReport: per-key estimates, basis-point shares, one-side keys") {
    val left = Seq(1L, 1L, 1L, 2L).toDF("k")
    val right = Seq(1L, 2L, 2L, 3L).toDF("j")
    val rep = DataQuality.joinSkewReport(left, right, "k", "j")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // total est = 3*1 + 1*2 + 0*1 = 5
    assert(rep.toSeq == Seq(
      (1L, 3L, 1L, 3L, 6000L),
      (2L, 1L, 2L, 2L, 4000L),
      (3L, 0L, 1L, 0L, 0L)))
  }

  test("latenessProfile: bucketed prefix-max equals the sequential running max") {
    import org.apache.spark.sql.functions._
    // arrival order 1..6 (event_id), event times with two late arrivals:
    // ts:      10, 100, 40(late 60ns), 200, 80(late 120ns), 300
    val ev = Seq((1L, 10L), (2L, 100L), (3L, 40L), (4L, 200L), (5L, 80L), (6L, 300L))
      .map { case (id, t) => (id, 1L, "t", t, 0.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    // bandNs=50, maxBand=2, bucketSize=2 → forces the cross-bucket prefix path
    val got = graft.analytics.EventsAnalytics
      .latenessProfile(ev, bucketSize = 2L, bandNs = 50L, maxBand = 2L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // lateness: 0,0,60,0,120,0 → bands: 0×4 (max 0), 1×1 (60), 2×1 (120)
    assert(got(0L) == ((4L, 0L)))
    assert(got(1L) == ((1L, 60L)))
    assert(got(2L) == ((1L, 120L)))
  }

  test("cleanNormalize: canonical form catches formatting variants") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "Hello,  World!"), (2L, "hello world"), (3L, "unchanged text"))
      .toDF("doc_id", "text")
    val out = graft.analytics.Curation.cleanNormalize(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(3), r.getInt(4)))).toMap
    // both variants normalize to "hello world" → same fingerprint
    assert(out(1L)._1 == out(2L)._1)
    assert(out(1L)._2 == 11L && out(1L)._3 == 1)
    assert(out(2L)._3 == 0 && out(3L)._3 == 0)
  }

  test("funnelPaths: hand-computed 3-step sequences with distinct-user support") {
    val ev = Seq(
      // user 1: a b c b c  -> abc, bcb, cbc
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "b"), (1L, 5L, "c"),
      // user 2: a b c      -> abc
      (2L, 6L, "a"), (2L, 7L, "b"), (2L, 8L, "c"),
      // user 3: too short for any path
      (3L, 9L, "a"), (3L, 10L, "b")
    ).map { case (u, i, t) => (u, i, t, i * 1000000000L) }
      .toDF("user_id", "event_id", "event_type", "ts")
    val got = EventsAnalytics.funnelPaths(ev)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      ("a", "b", "c", 2L, 2L),
      ("b", "c", "b", 1L, 1L),
      ("c", "b", "c", 1L, 1L)))
  }

  test("attribution: first/last/linear credits sum to 10000 per conversion") {
    // user 1: click@10, view@20, click@30, purchase@40 (3 touches),
    //         purchase@100 with lookback 50 -> no touch in window
    // user 2: view@5, purchase@8 (1 touch)
    val ev = Seq(
      (1L, 1L, "click", 10L), (2L, 1L, "view", 20L), (3L, 1L, "click", 30L),
      (4L, 1L, "purchase", 40L), (5L, 1L, "purchase", 100L),
      (6L, 2L, "view", 5L), (7L, 2L, "purchase", 8L),
      (8L, 2L, "error", 7L) // non-channel type never credited
    ).map { case (id, u, t, ts) => (id, u, t, ts, 0.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = EventsAnalytics.attribution(ev,
      channels = Seq("click", "view"), lookbackNs = 50L)
      .collect().map(r =>
        (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    // conversion u1@40: touches click(10), view(20), click(30); n=3
    //   first -> click 10000; last -> click 10000
    //   linear -> 3333 each + remainder 1 to the first: click 3334+3333, view 3333
    // conversion u2@8: view(5); all models -> view 10000
    assert(got == Map(
      ("first", "click") -> ((10000L, 1L)), ("first", "view") -> ((10000L, 1L)),
      ("last", "click") -> ((10000L, 1L)), ("last", "view") -> ((10000L, 1L)),
      ("linear", "click") -> ((6667L, 2L)), ("linear", "view") -> ((13333L, 2L))))
    // invariant: per model, total credit = 10000 x attributed conversions (2)
    Seq("first", "last", "linear").foreach { m =>
      assert(got.collect { case ((mm, _), (bp, _)) if mm == m => bp }.sum == 20000L)
    }
  }

  test("autocorrHourly: alternating series is -1/+1/-1 at lags 1/2/3; gaps are zeros") {
    val hourNs = 3600L * 1000000000L
    // type "alt": hourly counts 1,2,1,2,1,2 (hours 0..5)
    val alt = (0 to 5).flatMap { h =>
      val c = if (h % 2 == 0) 1 else 2
      (0 until c).map(i => (h * 10L + i, 1L, "alt", h * hourNs + i, 0.0))
    }
    // type "gap": events only in hours 0 and 2 -> dense series 1,0,1
    val gap = Seq((100L, 1L, "gap", 0L, 0.0), (101L, 1L, "gap", 2 * hourNs, 0.0))
    val ev = (alt ++ gap)
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = EventsAnalytics.autocorrHourly(ev).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // alt: lag1 pairs (1,2)(2,1)(1,2)(2,1)(1,2) -> r = -1 exactly;
    //      lag2 pairs all equal-valued -> +1; lag3 alternates -> -1
    assert(got(("alt", 1)) == ((5L, -1000000L)))
    assert(got(("alt", 2)) == ((4L, 1000000L)))
    assert(got(("alt", 3)) == ((3L, -1000000L)))
    // gap: without the zero fill lag1 would see (1,1); with it the pairs
    // are (1,0),(0,1) -> r = -1; lag2 is the single pair (1,1) -> zero
    // variance -> 0
    assert(got(("gap", 1)) == ((2L, -1000000L)))
    assert(got(("gap", 2)) == ((1L, 0L)))
  }
}
