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
}
