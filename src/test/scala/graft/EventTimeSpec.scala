package graft

import graft.analytics.EventTime
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Schema-adaptive event-time normalization: both physical forms of `ts`
  * (int64 epoch-ns and native timestamp) must converge to identical
  * epoch-ns longs, and fixture-schema drift must fail fast with one clear
  * message instead of scattered analysis exceptions.
  */
class EventTimeSpec extends SparkSpecBase {

  private val nsVals = Seq(0L, 1_500_000_000L, 3_600_000_000_000L,
    1_700_000_000_123_456_000L)

  test("long-ns and timestamp ts normalize to identical epoch-ns longs") {
    val longDf = spark.createDataFrame(
      nsVals.map(Row(_)).asJava,
      StructType(Seq(StructField("ts", LongType))))
    // µs image of the same instants as a native TIMESTAMP_NTZ column
    val tsDf = longDf.select(
      expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)").as("ts"))
    assert(tsDf.schema("ts").dataType == TimestampNTZType)
    val a = EventTime.toNanos(longDf).collect().map(_.getLong(0)).toSeq
    val b = EventTime.toNanos(tsDf).collect().map(_.getLong(0)).toSeq
    // ns → µs truncation is the documented precision of the timestamp form
    assert(b == nsVals.map(v => v / 1000 * 1000))
    assert(a == nsVals)
    // idempotent: normalizing twice is a no-op
    assert(EventTime.toNanos(EventTime.toNanos(tsDf))
      .collect().map(_.getLong(0)).toSeq == b)
  }

  test("withTsd yields the same TimestampType event time from either form") {
    val longDf = spark.createDataFrame(
      nsVals.map(Row(_)).asJava,
      StructType(Seq(StructField("ts", LongType))))
    val tsDf = longDf.select(
      expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)").as("ts"))
    val a = EventTime.withTsd(longDf).select("tsd")
    val b = EventTime.withTsd(tsDf).select("tsd")
    assert(a.schema("tsd").dataType == TimestampType)
    assert(b.schema("tsd").dataType == TimestampType)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("fixture schema drift fails fast with a single clear message") {
    val bad = spark.createDataFrame(
      Seq(Row("2024-01-01")).asJava,
      StructType(Seq(StructField("ts", StringType))))
    val e = intercept[IllegalArgumentException](EventTime.toNanos(bad))
    assert(e.getMessage.contains("unsupported type"))
    assert(e.getMessage.contains("ts"))
    val e2 = intercept[IllegalArgumentException](
      EventTime.requireEventTime("events", bad, "ts"))
    assert(e2.getMessage.contains("fixture `events`.`ts`"))
    assert(e2.getMessage.contains("schema drift"))
    // accepted forms (and absent columns) pass the assertion silently
    EventTime.requireEventTime("events",
      bad.select(lit(1L).as("ts")), "ts")
    EventTime.requireEventTime("events", bad.select(lit(1L).as("x")), "ts")
  }
}
