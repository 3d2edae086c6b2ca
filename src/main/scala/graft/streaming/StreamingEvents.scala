package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming variants of the events analytics: the same logical
  * transforms as [[graft.analytics.EventsAnalytics]] expressed over an
  * unbounded source with watermarks. Batch results stay the oracle (the t2
  * gate runs batch); these entry points exist so the engine can run the
  * identical pipeline incrementally — `readStream` → transform →
  * `writeStream` with checkpointed state.
  */
object StreamingEvents {

  /** The events schema as currently written by the fixtures (parquet
    * `timestamp[us]`, which Spark reads as TIMESTAMP_NTZ). [[readEvents]]
    * prefers the schema of files already present at the path, so a landing
    * zone shipping int64-ns events streams just as well.
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source over a parquet path (new files are picked
    * up incrementally — the standard landing-zone pattern). The physical
    * `ts` type is taken from files already at the path (falling back to
    * [[eventsSchema]]); downstream always sees the canonical pair
    * `ts` = epoch-ns BIGINT, `tsd` = TimestampType event time.
    */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    val schema =
      try spark.read.parquet(path).schema
      catch { case _: Throwable => eventsSchema }
    val raw = spark.readStream.schema(schema).parquet(path)
    graft.analytics.EventTime.toNanos(
      graft.analytics.EventTime.withTsd(raw))
  }

  /** Tumbling 1-hour counts with a 2-hour watermark: late events beyond the
    * watermark are dropped, state is bounded — the scale requirement for an
    * unbounded source.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("tsd", "2 hours")
      .groupBy(window(col("tsd"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("n"))

  /** Sessionized per-user counts (30-minute gap), watermarked. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("tsd", "2 hours")
      .groupBy(session_window(col("tsd"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"))

  /** Streaming exact dedup: drop documents whose content fingerprint was
    * already seen, keeping state across micro-batches — the incremental form
    * of [[graft.analytics.Dedup.fingerprintGroups]]. In production add
    * `withWatermark` on an arrival-time column to bound state.
    */
  def streamingDedup(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .dropDuplicates("fp")

  /** Streaming dedup with BOUNDED state: `dropDuplicatesWithinWatermark`
    * keeps a fingerprint in state only until the event-time watermark passes
    * it, so state size tracks the watermark window instead of growing with
    * the corpus — the shape an unbounded ingest needs (the unbounded
    * [[streamingDedup]] is exact forever but its state is O(distinct keys)).
    * Duplicates arriving within the watermark window are dropped exactly;
    * a duplicate arriving after its original's fingerprint expired would be
    * re-admitted, which is the documented contract of the operator.
    *
    * `tsCol` must name an event-time TIMESTAMP column (the watermark
    * anchor); the docs fixture has none, so callers ingesting documents
    * attach an arrival/ingest timestamp first (see `StreamingSpec`).
    */
  def streamingDedupBounded(
      docs: DataFrame, textCol: String = "text", tsCol: String = "tsd",
      delay: String = "2 hours"): DataFrame =
    docs
      .withColumn("fp", graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming IMAGE dedup on the perceptual hash — the multimodal ingest
    * twin of [[streamingDedup]]: each arriving image decodes and hashes
    * inside its micro-batch (the map-only
    * [[graft.analytics.Multimodal.imagePerceptualHashes]] path runs
    * unchanged on a streaming DataFrame), then first-seen-wins state on
    * the 64-bit signature drops re-posts/recompressions of already-seen
    * images as they arrive. State is one row per DISTINCT signature —
    * perceptual groups are far coarser than exact fingerprints, so this
    * state is smaller than [[streamingDedup]]'s on the same stream; bound
    * it further with a watermark exactly as [[streamingDedupBounded]]
    * does.
    */
  def streamingImagePhashDedup(docs: DataFrame): DataFrame =
    graft.analytics.Multimodal.imagePerceptualHashes(docs)
      .dropDuplicates("phash")

  /** Streaming grouped top-k — the streaming face of the batch
    * [[graft.plans.TopKPerKey]] operator: per user, the k smallest
    * (ts, event_id) rows seen so far, held in BOUNDED per-key state (≤ k
    * entries — the same O(keys × k) bound the batch operator's heaps
    * enforce per task). A key re-emits its refreshed top-k only when it
    * changed, tagged with the key's state version (rows seen so far) —
    * the changelog shape a downstream sink upserts by
    * (user_id, max version).
    */
  def streamingTopKPerUser(events: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("user_id", "ts", "event_id").as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Seq[(Long, Long)], Long), (Long, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Seq[(Long, Long)], Long)]) =>
          val (cur, seen) = state.getOption.getOrElse((Seq.empty[(Long, Long)], 0L))
          val incoming = rows.map(r => (r._2, r._3)).toSeq
          val merged = (cur ++ incoming).sorted.take(k)
          val nSeen = seen + incoming.size
          state.update((merged, nSeen))
          if (merged != cur) merged.iterator.map(t => (user, t._1, t._2, nSeen))
          else Iterator.empty
      }
      .toDF("user_id", "ts", "event_id", "version")
  }

  /** Streaming face of [[graft.analytics.EventsAnalytics.ewma]]: the same
    * dyadic-weight moving average over the last `terms` observations per
    * user, emitted per arriving event — the smoothing stage of a live
    * metrics pipeline. State is the bounded ring of the key's last
    * `terms` quantized values (O(terms) longs per user, the streamability
    * the batch operator's fixed horizon was designed for); each event's
    * score is the identical BIGINT weighted sum + one IEEE divide, so
    * emissions converge to the batch answer exactly. Rows are processed
    * in (ts, event_id) order within each micro-batch; cross-batch order
    * is the file-source arrival contract (per-key in-order delivery —
    * the same assumption every keyed-state smoothing operator makes).
    */
  def streamingEwma(events: DataFrame, terms: Int = 16,
      quantScale: Long = 1000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("event_id", "ts", "user_id", "value")
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[Seq[Long], (Long, Long, Long, Double)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[Seq[Long]]) =>
          var buf = state.getOption.getOrElse(Seq.empty[Long])
          val out = rows.toSeq.sortBy(r => (r._2, r._1)).map { r =>
            val q = math.floor(r._4 * quantScale).toLong
            buf = (buf :+ q).takeRight(terms)
            val m = buf.length
            var ws = 0L
            var wt = 0L
            var j = 0
            while (j < m) {
              val wgt = 1L << (terms - 1 - j)
              ws += buf(m - 1 - j) * wgt
              wt += wgt
              j += 1
            }
            (r._1, user, ws, ws.toDouble / (wt * quantScale).toDouble)
          }
          state.update(buf)
          out.iterator
      }
      .toDF("event_id", "user_id", "ewma_scaled", "ewma")
  }

  /** Streaming face of
    * [[graft.analytics.EventsAnalytics.sessionsCapped]]: per arriving
    * event its (island, slice) session assignment — gap islands open on a
    * `gapNs` silence, the `capNs` duration cap slices at fixed offsets
    * from the island start. Keyed state is THREE longs per user (island
    * counter, island start, last ts) regardless of stream length; the
    * assignments equal the batch window computation row for row (the
    * parity spec states it as a set equality), and the session aggregate
    * is a downstream groupBy on the emitted keys. Same in-order per-key
    * delivery contract as [[streamingEwma]].
    */
  def streamingSessionAssign(
      events: DataFrame,
      gapNs: Long = 1800000000000L,
      capNs: Long = 7200000000000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("event_id", "ts", "user_id")
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long, Long)]) =>
          var (island, start, last) =
            state.getOption.getOrElse((0L, Long.MinValue, Long.MinValue))
          val out = rows.toSeq.sortBy(r => (r._2, r._1)).map { r =>
            val ts = r._2
            if (last == Long.MinValue || ts - last > gapNs) {
              island += 1
              start = ts
            }
            last = ts
            (r._1, user, island, (ts - start) / capNs)
          }
          state.update((island, start, last))
          out.iterator
      }
      .toDF("event_id", "user_id", "island", "slice")
  }

  /** Streaming face of
    * [[graft.analytics.EventsAnalytics.rateLimitAdmission]]: live
    * token-bucket admission per user. Keyed state is the bucket — two
    * longs (tokens, clock) — so memory is O(users) for any stream
    * length; each arriving event emits its admit/reject decision in
    * append mode, and whole-token refills advance the bucket clock
    * exactly as the batch fold does, so the decisions are
    * row-identical to the batch replay under the same in-order
    * per-key delivery contract as [[streamingSessionAssign]] (rows
    * within a micro-batch sort by event time; micro-batches arrive
    * time-ordered per key).
    */
  def streamingRateLimit(
      events: DataFrame,
      capacity: Long = 3L,
      refillNs: Long = 3600L * 1000000000L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("event_id", "ts", "user_id")
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Int)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) =>
          var (tok, last) = state.getOption.getOrElse((-1L, 0L))
          val out = rows.toSeq.sortBy(r => (r._2, r._1)).map { r =>
            val ts = r._2
            if (tok < 0) { tok = capacity; last = ts }
            else {
              val refill = (ts - last) / refillNs
              if (tok + refill >= capacity) { tok = capacity; last = ts }
              else { tok += refill; last += refill * refillNs }
            }
            val admitted = if (tok >= 1) { tok -= 1; 1 } else 0
            (user, r._1, admitted)
          }
          state.update((tok, last))
          out.iterator
      }
      .toDF("user_id", "event_id", "admitted")
  }

  /** Streaming face of [[graft.analytics.EventsAnalytics.transitions]]:
    * the running first-order Markov transition matrix over per-user event
    * streams. Keyed state is ONE value — the user's last event type —
    * so memory is O(users) regardless of stream length; each arriving
    * event emits its (from_type, to_type) edge and the downstream
    * complete-mode aggregate keeps the running matrix. The same in-order
    * per-key delivery contract as [[streamingEwma]].
    */
  def streamingTransitions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events.selectExpr("event_id", "ts", "user_id", "event_type")
      .as[(Long, Long, Long, String)]
      .groupByKey(_._3)
      .flatMapGroupsWithState[String, (Long, String, String)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[String]) =>
          var prev = state.getOption.orNull
          val out = rows.toSeq.sortBy(r => (r._2, r._1)).flatMap { r =>
            val edge = if (prev == null) Nil else Seq((user, prev, r._4))
            prev = r._4
            edge
          }
          state.update(prev)
          out.iterator
      }
      .toDF("user_id", "from_type", "to_type")
  }

  /** Streaming face of [[graft.analytics.Sketches.histogramQuantiles]]:
    * the running value-histogram sketch in complete mode. The sketch IS a
    * bin-count relation and merges by addition, so the streaming operator
    * is literally the same groupBy — O(domain · resolution) state
    * regardless of stream length — and
    * [[graft.analytics.Sketches.quantilesFromBins]] reads p50/p90/p99 off
    * the sink at any moment (the live latency-percentile dashboard shape).
    */
  def streamingValueBins(events: DataFrame, binsPerUnit: Long = 10L): DataFrame =
    graft.analytics.Sketches.valueBins(events, "value", binsPerUnit)

  /** Streaming face of [[graft.analytics.DataQuality.qualityAssertions]]:
    * running violation counts for the map-only rules over an unbounded
    * document stream (complete mode — the live data-quality dashboard a
    * production ingest watches). The corpus-context uniqueness rule is
    * inherently historical; its streaming analogue is the stateful dedup
    * tier ([[streamingDedup]] / [[streamingDedupBounded]]), which drops
    * duplicates rather than counting them.
    */
  def streamingQualityCounts(docs: DataFrame): DataFrame =
    docs.agg(
      sum(when(col("text").isNull || length(col("text")) === 0, 1L)
        .otherwise(0L)).as("v_empty_text"),
      sum(when(col("n_chars") =!= length(col("text")), 1L)
        .otherwise(0L)).as("v_chars"),
      sum(when(col("lang").isNull || col("lang") === "", 1L)
        .otherwise(0L)).as("v_lang"),
      count(lit(1)).as("n_docs"))

  /** Custom keyed state via mapGroupsWithState: running per-user event
    * counts updated each micro-batch (the
    * `KeyValueGroupedDataset.mapGroupsWithState` extension point for state
    * the built-in aggregations can't express).
    */
  def runningUserCounts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    import org.apache.spark.sql.{Encoders, Row}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "event_id")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Long, (Long, Long)](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
          val n = state.getOption.getOrElse(0L) + rows.size
          state.update(n)
          (user, n)
      }
      .toDF("user_id", "n_events")
  }

  /** [[runningUserCountsTws]]'s per-key processor: one `ValueState[Long]`
    * updated per micro-batch — the minimal `StatefulProcessor`, kept as a
    * top-level class so the checkpointed operator survives re-planning.
    */
  class RunningCountProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, (Long, Long), (Long, Long)] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
    @transient private var count: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long)],
        timers: TimerValues): Iterator[(Long, Long)] = {
      val n = (if (count.exists()) count.get() else 0L) + rows.size
      count.update(n)
      Iterator.single((key, n))
    }
  }

  /** Running per-user event counts on the `transformWithState` API (the
    * Spark 4 arbitrary-state operator that supersedes
    * `mapGroupsWithState`: typed composable state — value/list/map —
    * timers, and TTL, all backed by the RocksDB state store). Same
    * semantics as [[runningUserCounts]], kept side by side so the two
    * state APIs stay parity-tested against the same batch totals.
    *
    * Requires the RocksDB state-store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — transformWithState does not
    * run on the default HDFS-backed store.
    */
  def runningUserCountsTws(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "event_id")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RunningCountProcessor,
        TimeMode.None(), OutputMode.Update())
      .toDF("user_id", "n_events")
  }

  /** Per-user session state for [[closedSessions]]. */
  final case class SessState(start: Long, last: Long, n: Long)

  /** Closed-session emission via `flatMapGroupsWithState` + event-time
    * timeout: a session (30-minute gap rule, matching the batch
    * `session_window`) is emitted exactly once — either when a later event
    * opens the next session, or when the watermark passes its end. This is
    * the state shape the built-in aggregations can't express: arbitrary
    * per-key state, multiple outputs per key per batch, and timeout-driven
    * flushing with bounded state.
    *
    * Output: (user_id, session_start_ms, n_events).
    */
  def closedSessions(events: DataFrame, gapMs: Long = 30L * 60 * 1000): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("tsd", "2 hours")
      // the watermarked timestamp column itself must reach the stateful
      // operator — convert to millis inside the lambda, not in a projection
      .select(col("user_id"), col("tsd"))
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState, (Long, Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, raw: Iterator[(Long, java.sql.Timestamp)], state: GroupState[SessState]) =>
          val rows = raw.map(r => (r._1, r._2.getTime))
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single((user, s.start, s.n))
          } else {
            var closed = List.empty[(Long, Long, Long)]
            var cur = state.getOption
            rows.map(_._2).toArray.sorted.foreach { t =>
              cur = cur match {
                case Some(s) if t - s.last >= gapMs =>
                  closed ::= ((user, s.start, s.n))
                  Some(SessState(t, t, 1))
                // an above-watermark event may still arrive with t < s.last
                // (cross-batch disorder): extend the session on BOTH ends —
                // never regress `last` or the next event sees a spurious gap
                case Some(s) =>
                  Some(SessState(math.min(s.start, t), math.max(s.last, t), s.n + 1))
                case None => Some(SessState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the timeout must land strictly above the current watermark
              // or the runtime rejects it (possible when a late-but-valid
              // event merges into a session the watermark already passed)
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs + 1))
            }
            closed.reverse.iterator
          }
      }
      .toDF("user_id", "session_start_ms", "n_events")
  }

  /** Stream-stream interval join: each purchase matched to the same user's
    * clicks within the preceding hour. Watermarks on BOTH sides plus the
    * time-bound join condition let Spark GC join state — without them a
    * stream-stream join buffers forever, the failure mode that matters on
    * an unbounded source.
    */
  def purchaseClickJoin(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("tsd").as("p_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "2 hours")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("tsd").as("c_ts"),
        col("event_id").as("click_id"))
      .withWatermark("c_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"))
  }

  /** Stream-static enrichment: classify each streamed event into a value
    * band via a broadcast non-equi join against a static dimension — the
    * standard streaming enrichment shape (the static side is planned once
    * per micro-batch, broadcast, never stateful). Mirrors the batch
    * `events_value_band_join` semantics per event.
    */
  def valueBandEnrich(events: DataFrame, bands: DataFrame): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(bands),
      col("value") >= col("lo") && col("value") < col("hi"), "inner")
      .select(col("event_id"), col("user_id"), col("band"))

  /** Drive a streaming DataFrame to a named in-memory table and process all
    * currently-available input — the local smoke path (a real deployment
    * would use a durable sink + trigger).
    */
  /** Streaming face of [[graft.engine.Cdc.mergeApply]]: maintain the
    * current row image per key from an unbounded I/U/D change stream and
    * emit the post-batch image (or tombstone) for every key a micro-batch
    * touches — the changelog a downstream sink applies to keep a
    * snapshot fresh without re-reading it. State is ONE row image per
    * key (bounded by key cardinality, not stream length); late or
    * replayed changes with a lower `seq` than the state are ignored —
    * the same last-wins contract the batch operator compacts with, so
    * the stream's final emissions equal `mergeApply` over the union of
    * all batches (parity-tested incl. a cross-batch delete-then-update).
    * Fixed (id, name, v) payload: `flatMapGroupsWithState` needs an
    * Encoder, and a generic-Row state would trade the typed fast path
    * for reflection — real deployments generate this per table schema.
    */
  def streamingCdcApply(changes: DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val spark = changes.sparkSession
    import spark.implicits._
    changes.selectExpr("id", "name", "v", "seq", "op")
      .as[(Long, String, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String, Long, Boolean),
        (Long, Long, String, Long, Boolean)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (id: Long, rows: Iterator[(Long, String, Long, Long, String)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, String, Long, Boolean)]) =>
          var cur = state.getOption.getOrElse((Long.MinValue, null: String, 0L, false))
          rows.toSeq.sortBy(_._4).foreach { r =>
            if (r._4 > cur._1) cur = (r._4, r._2, r._3, r._5 != "D")
          }
          state.update(cur)
          Iterator((id, cur._1, cur._2, cur._3, !cur._4))
      }
      .toDF("id", "seq", "name", "v", "is_deleted")
  }

  def runToMemory(df: DataFrame, name: String, outputMode: String = "complete"): Unit = {
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(outputMode)
      .start()
    try q.processAllAvailable()
    finally q.stop()
  }
}
