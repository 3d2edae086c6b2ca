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

  test("streaming dedup keeps one row per fingerprint across micro-batches") {
    import java.nio.file._
    // stage the same docs file TWICE so every doc is a cross-batch duplicate
    val dir = Files.createTempDirectory("graft_dedup_stream")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"), dir.resolve("a.parquet"))
    Files.copy(Paths.get(s"$sfDir/documents.parquet"), dir.resolve("b.parquet"))
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    StreamingEvents.runToMemory(
      StreamingEvents.streamingDedup(stream), "stream_dedup", outputMode = "append")
    val batchDistinct = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("md5(CAST(lower(trim(text)) AS BINARY))").distinct().count()
    assert(spark.table("stream_dedup").count() == batchDistinct)
  }

  test("streaming image phash dedup keeps one image per signature across micro-batches") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    // split the corpus into two micro-batches; cross-batch perceptual
    // duplicates (same gradient signature from a different doc) must be
    // dropped by the signature state, not just within-batch ones
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "n_chars")
    val dir = Files.createTempDirectory("graft_phash_stream")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/a")
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.parquet(s"$dir/b")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    StreamingEvents.runToMemory(
      StreamingEvents.streamingImagePhashDedup(stream), "stream_phash",
      outputMode = "append")
    val kept = spark.table("stream_phash")
    val batchHashes = graft.analytics.Multimodal.imagePerceptualHashes(docs)
      .select("phash").distinct()
    // exactly one representative per distinct signature, signatures equal
    assert(kept.count() == batchHashes.count())
    assert(kept.select("phash").exceptAll(batchHashes).count() == 0)
  }

  test("streaming quality counts converge to the batch aggregate over two micro-batches") {
    import java.nio.file._
    val dir = Files.createTempDirectory("graft_quality_stream")
    Files.copy(Paths.get(s"$sfDir/documents.parquet"), dir.resolve("a.parquet"))
    Files.copy(Paths.get(s"$sfDir/documents.parquet"), dir.resolve("b.parquet"))
    val schema = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(dir.toString)
    StreamingEvents.runToMemory(
      StreamingEvents.streamingQualityCounts(stream), "stream_quality")
    val batch = StreamingEvents.streamingQualityCounts(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .union(spark.read.parquet(s"$sfDir/documents.parquet"))).head
    assert(spark.table("stream_quality").head.toSeq == batch.toSeq)
    // the doubled fixture is clean, so the running counters read zero
    // violations over 2x the docs
    assert(batch.getLong(3) == 2 * spark.read
      .parquet(s"$sfDir/documents.parquet").count())
  }

  test("bounded-state streaming dedup drops within-watermark duplicates across micro-batches") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    // two batches of the SAME docs, one minute apart in event time (well
    // inside the 2h watermark delay) — every batch-2 row is a cross-batch
    // duplicate and must be dropped, exactly like the unbounded operator
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = Files.createTempDirectory("graft_dedup_wm")
    def stage(name: String, baseSec: Long): Unit =
      docs.withColumn("arrival", timestamp_seconds(lit(baseSec)))
        .coalesce(1).write.parquet(s"$dir/$name")
    stage("a", 1000L)
    stage("b", 1060L)
    val schema = spark.read.parquet(s"$dir/a").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    StreamingEvents.runToMemory(
      StreamingEvents.streamingDedupBounded(stream, tsCol = "arrival"),
      "stream_dedup_wm", outputMode = "append")
    val batchDistinct = docs
      .selectExpr("md5(CAST(lower(trim(text)) AS BINARY))").distinct().count()
    assert(spark.table("stream_dedup_wm").count() == batchDistinct)
  }

  test("streaming top-k per user converges to the batch TopKPerKey answer across micro-batches") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    // two files + maxFilesPerTrigger=1 forces TWO micro-batches, so the
    // bounded per-key state genuinely merges across batches
    val events = graft.analytics.EventTime.toNanos(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val dir = Files.createTempDirectory("graft_stream_topk")
    events.filter(col("event_id") % 2 === 0)
      .coalesce(1).write.parquet(s"$dir/a")
    events.filter(col("event_id") % 2 =!= 0)
      .coalesce(1).write.parquet(s"$dir/b")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    StreamingEvents.runToMemory(
      StreamingEvents.streamingTopKPerUser(stream, 3), "stream_topk",
      outputMode = "update")
    val emitted = spark.table("stream_topk")
    // changelog contract: the latest emission per user is its final top-k
    val latest = emitted
      .withColumn("mx", max("version").over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")))
      .filter(col("version") === col("mx"))
      .select("user_id", "ts", "event_id")
    val batch = graft.plans.TopKPerKey.topKPerKey(
        events, Seq("user_id"), Seq("ts", "event_id"), 3)
      .select("user_id", "ts", "event_id")
    assert(latest.count() == batch.count())
    assert(latest.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(latest).count() == 0)
  }

  test("streaming ewma emissions equal the batch dyadic EWMA across micro-batches") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    val events = graft.analytics.EventTime.toNanos(
      spark.read.parquet(s"$sfDir/events.parquet"))
    // split by TIME so per-user arrival order holds across the two
    // micro-batches — the in-order delivery contract of the operator
    val mid = events.agg(
      org.apache.spark.sql.functions.expr("percentile(ts, 0.5)")).head.getDouble(0)
    val dir = Files.createTempDirectory("graft_stream_ewma")
    events.filter(col("ts") <= mid).coalesce(1).write.parquet(s"$dir/a")
    events.filter(col("ts") > mid).coalesce(1).write.parquet(s"$dir/b")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    StreamingEvents.runToMemory(
      StreamingEvents.streamingEwma(stream), "stream_ewma",
      outputMode = "append")
    val streamed = spark.table("stream_ewma")
    val batch = EventsAnalytics.ewma(events)
      .select("event_id", "user_id", "ewma_scaled", "ewma")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming capped-session assignments equal the batch windows across micro-batches") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    val events = graft.analytics.EventTime.toNanos(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val mid = events.agg(expr("percentile(ts, 0.5)")).head.getDouble(0)
    val dir = Files.createTempDirectory("graft_stream_sess")
    events.filter(col("ts") <= mid).coalesce(1).write.parquet(s"$dir/a")
    events.filter(col("ts") > mid).coalesce(1).write.parquet(s"$dir/b")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    StreamingEvents.runToMemory(
      StreamingEvents.streamingSessionAssign(stream), "stream_sess",
      outputMode = "append")
    val streamed = spark.table("stream_sess")
    val batch = EventsAnalytics.sessionAssignments(events)
      .select("event_id", "user_id", "island", "slice")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming rate-limit decisions equal the batch token-bucket replay") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    val events = graft.analytics.EventTime.toNanos(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val mid = events.agg(expr("percentile(ts, 0.5)")).head.getDouble(0)
    val dir = Files.createTempDirectory("graft_stream_rate")
    events.filter(col("ts") <= mid).coalesce(1).write.parquet(s"$dir/a")
    events.filter(col("ts") > mid).coalesce(1).write.parquet(s"$dir/b")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    StreamingEvents.runToMemory(
      StreamingEvents.streamingRateLimit(stream), "stream_rate",
      outputMode = "append")
    val streamed = spark.table("stream_rate")
    val batch = EventsAnalytics.rateLimitAdmission(events)
      .select("user_id", "event_id", "admitted")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming transition edges aggregate to the batch Markov matrix") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    val events = graft.analytics.EventTime.toNanos(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val mid = events.agg(expr("percentile(ts, 0.5)")).head.getDouble(0)
    val dir = Files.createTempDirectory("graft_stream_trans")
    events.filter(col("ts") <= mid).coalesce(1).write.parquet(s"$dir/a")
    events.filter(col("ts") > mid).coalesce(1).write.parquet(s"$dir/b")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    StreamingEvents.runToMemory(
      StreamingEvents.streamingTransitions(stream), "stream_trans",
      outputMode = "append")
    // the emitted edge stream aggregates to exactly the batch matrix —
    // including edges whose endpoints straddle the micro-batch boundary
    // (the carried last-type state)
    val streamed = spark.table("stream_trans")
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
    val batch = EventsAnalytics.transitions(events)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("streaming histogram sketch yields the batch quantile estimates") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    // two micro-batches: the complete-mode bin relation must merge them
    val dir = Files.createTempDirectory("graft_stream_bins")
    events.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$dir/a")
    events.filter(col("event_id") % 2 =!= 0).coalesce(1).write.parquet(s"$dir/b")
    val stream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    StreamingEvents.runToMemory(
      StreamingEvents.streamingValueBins(stream), "stream_bins",
      outputMode = "complete")
    val fromStream = graft.analytics.Sketches
      .quantilesFromBins(spark.table("stream_bins"), binsPerUnit = 10L)
    val batch = graft.analytics.Sketches.histogramQuantiles(events)
    assert(fromStream.count() == 3)
    assert(fromStream.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(fromStream).count() == 0)
  }

  test("streaming IVF ingest assigns new vectors to the same cells as the materialized index") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idx = Files.createTempDirectory("graft_stream_idx").toString
    graft.analytics.Similarity.ivfPqIndexBuild(emb, idx, trainMod = 4)
    // stream the same vectors back in as "new arrivals": map-only
    // assignment against the frozen coarse head must reproduce the
    // index's own cell assignments exactly
    val dir = Files.createTempDirectory("graft_stream_vec")
    emb.coalesce(1).write.parquet(s"$dir/a")
    val stream = spark.readStream.schema(emb.schema).parquet(s"$dir/*")
    StreamingEvents.runToMemory(
      graft.analytics.Similarity.streamingIvfAssign(stream, idx),
      "stream_ivf", outputMode = "append")
    val streamed = spark.table("stream_ivf")
    val indexed = spark.read.parquet(s"$idx/codes.parquet")
      .select(col("vec_id"), col("cell_id").cast("long").as("cell_id")).distinct()
    assert(streamed.count() == emb.count())
    assert(streamed.select(col("vec_id"), col("cell_id").cast("long").as("cell_id"))
      .exceptAll(indexed).count() == 0)
  }

  test("mapGroupsWithState running user counts reach the batch totals") {
    val stream = StreamingEvents.readEvents(spark, streamDir)
    StreamingEvents.runToMemory(
      StreamingEvents.runningUserCounts(stream), "stream_ucounts", outputMode = "update")
    val streamed = spark.table("stream_ucounts")
    val batch = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id").count()
    assert(streamed.count() == batch.count())
    assert(streamed.join(batch,
      streamed("user_id") === batch("user_id") &&
        streamed("n_events") === batch("count")).count() == batch.count())
  }

  test("bounded-state dedup re-admits a duplicate after its fingerprint expired") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the operator's documented contract: state holds a fingerprint only
    // until the watermark passes its event time + delay. batch1 stores the
    // docs at t=1000s; batch2 (one far-future sentinel) advances the
    // watermark to 200000s - 2h, far past every batch-1 expiry; the SAME
    // docs then replay in two consecutive batches — whichever side of the
    // eviction point the runtime lands on (state cleanup runs once per
    // batch), EXACTLY ONE replay is re-admitted in full.
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    val dir = Files.createTempDirectory("graft_dedup_expire")
    def stage(name: String, df: org.apache.spark.sql.DataFrame, sec: Long): Unit =
      df.withColumn("arrival", timestamp_seconds(lit(sec)))
        .coalesce(1).write.parquet(s"$dir/$name")
    stage("a", docs, 1000L)
    stage("b",
      Seq((-1L, "zz_sentinel_zz", "en", "srcX", 14L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"), 200000L)
    stage("c", docs, 201000L)
    stage("d", docs, 202000L)
    val schema = spark.read.parquet(s"$dir/a").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/{a,b,c,d}")
    StreamingEvents.runToMemory(
      StreamingEvents.streamingDedupBounded(stream, tsCol = "arrival"),
      "stream_dedup_expire", outputMode = "append")
    val distinct = docs
      .selectExpr("md5(CAST(lower(trim(text)) AS BINARY))").distinct().count()
    // original admission + exactly one post-expiry re-admission + sentinel
    assert(spark.table("stream_dedup_expire").count() == 2 * distinct + 1)
  }

  test("transformWithState running user counts reach the batch totals") {
    // transformWithState requires the RocksDB state store; scope the
    // provider override to this query and restore the default after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = StreamingEvents.readEvents(spark, streamDir)
      StreamingEvents.runToMemory(
        StreamingEvents.runningUserCountsTws(stream), "stream_tws",
        outputMode = "update")
      val streamed = spark.table("stream_tws")
      val batch = spark.read.parquet(s"$sfDir/events.parquet")
        .groupBy("user_id").count()
      assert(streamed.count() == batch.count())
      assert(streamed.join(batch,
        streamed("user_id") === batch("user_id") &&
          streamed("n_events") === batch("count")).count() == batch.count())
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("flatMapGroupsWithState emits each closed session once, matching batch sessions") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    // stage the fixture in two time-ordered halves so the watermark
    // advances across micro-batches and event-time timeouts fire
    val events = graft.analytics.EventTime.toNanos(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val cut = events.selectExpr("percentile(ts, 0.5)").head.getDouble(0).toLong
    val dir = Files.createTempDirectory("graft_sess_stream")
    events.filter(col("ts") <= cut).coalesce(1)
      .write.parquet(s"$dir/batch1")
    events.filter(col("ts") > cut).coalesce(1)
      .write.parquet(s"$dir/batch2")
    val schema = events.schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
      .withColumn("tsd", expr("timestamp_micros(ts div 1000)"))
    StreamingEvents.runToMemory(
      StreamingEvents.closedSessions(stream), "stream_closed", outputMode = "append")
    val emitted = spark.table("stream_closed")
    assert(emitted.count() > 0, "watermark should close most sessions")
    // no session emitted twice
    assert(emitted.distinct().count() == emitted.count())
    // every emitted session is a genuine batch session (same start + size)
    val batch = EventsAnalytics.sessions(events)  // user_id, session_start(s), n_events, total
    val joined = emitted.join(batch,
      emitted("user_id") === batch("user_id") &&
        (emitted("session_start_ms") / 1000).cast("long") === batch("session_start") &&
        emitted("n_events") === batch("n_events"))
    assert(joined.count() == emitted.count(),
      s"emitted ${emitted.count()} but only ${joined.count()} match batch sessions")
  }

  test("closedSessions merges cross-batch out-of-order events instead of splitting") {
    import java.nio.file._
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ooo_sess")
    def stage(name: String, tsSec: Seq[Long]): Unit =
      tsSec.map(t => (1L, t)).toDF("user_id", "sec")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("tsd"))
        .coalesce(1).write.parquet(s"$dir/$name")
    // batch1 ends at t=1100; batch2 delivers t=1050 OUT OF ORDER (above
    // watermark) then t=2870: within the 30-min gap of last=1100, but beyond
    // the gap of 1050 — a buggy merge that regresses `last` to 1050 would
    // split one real session into two here
    stage("b1", Seq(1000L, 1100L))
    stage("b2", Seq(1050L, 2870L))
    // far-future batch advances the watermark so the event-time timeout
    // flushes the open session
    stage("b3", Seq(100000L))
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*")
    StreamingEvents.runToMemory(
      StreamingEvents.closedSessions(stream), "stream_ooo", outputMode = "append")
    val rows = spark.table("stream_ooo")
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(rows.contains((1000000L, 4L)),
      s"expected one merged 4-event session starting at t=1000s, got $rows")
    assert(!rows.exists(_._1 == 2870000L),
      s"session was split at the out-of-order boundary: $rows")
  }

  test("stream-static broadcast enrichment equals the batch band join") {
    import spark.implicits._
    val bands = Seq(
      ("low", 0.0, 50.0), ("mid", 50.0, 100.0),
      ("high", 100.0, 200.0), ("extreme", 200.0, 1e9))
      .toDF("band", "lo", "hi")
    val stream = StreamingEvents.readEvents(spark, streamDir)
    StreamingEvents.runToMemory(
      StreamingEvents.valueBandEnrich(stream, bands), "stream_bands",
      outputMode = "append")
    val streamed = spark.table("stream_bands")
    val batch = StreamingEvents.valueBandEnrich(
      spark.read.parquet(s"$sfDir/events.parquet"), bands)
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0)
  }

  test("stream-stream interval join equals the batch interval join") {
    val stream = StreamingEvents.readEvents(spark, streamDir)
    StreamingEvents.runToMemory(
      StreamingEvents.purchaseClickJoin(stream), "stream_ssjoin",
      outputMode = "append")
    val ev = graft.analytics.EventTime.withTsd(
      spark.read.parquet(s"$sfDir/events.parquet"))
    val batch = StreamingEvents.purchaseClickJoin(ev)
    assert(spark.table("stream_ssjoin").count() == batch.count())
    assert(spark.table("stream_ssjoin").exceptAll(batch).count() == 0)
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
