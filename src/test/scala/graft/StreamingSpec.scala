package graft

import graft.analytics.EventsAnalytics
import graft.streaming.StreamingEvents

/** Streaming/batch parity: the streaming tumbling aggregation over the whole
  * fixture must equal the batch result (complete output mode, single
  * micro-batch over the static file).
  */
class StreamingSpec extends SparkSpecBase {

  // the file streaming source requires a directory (landing-zone layout);
  // stage the single fixture file into one
  private lazy val streamDir: String = {
    import java.nio.file._
    val dir = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events-000.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir.toString
  }

  test("streaming tumbling counts equal batch tumbling counts") {
    val stream = StreamingEvents.readEvents(spark, streamDir)
    StreamingEvents.runToMemory(
      StreamingEvents.tumblingCounts(stream), "stream_tumbling")
    val streamed = spark.table("stream_tumbling")
    val batch = EventsAnalytics.tumbling(
      spark.read.parquet(s"$sfDir/events.parquet"))
      .select("hour_ts", "event_type", "n")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("streaming sessionization produces bounded per-user sessions") {
    val stream = StreamingEvents.readEvents(spark, streamDir)
    StreamingEvents.runToMemory(
      StreamingEvents.sessionCounts(stream), "stream_sessions")
    val sessions = spark.table("stream_sessions")
    assert(sessions.count() > 0)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    assert(sessions.groupBy().sum("n_events").head.getLong(0) == events.count())
  }
}
