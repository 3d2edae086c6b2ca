package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series analytics over the `events` fixture (SURVEY.md §7.5).
  * The `ts` column arrives either as Long nanoseconds or as a native
  * TIMESTAMP/TIMESTAMP_NTZ (parquet `timestamp[us]`); every entry point
  * normalizes through [[EventTime]] to canonical epoch-ns longs, so the
  * arithmetic below is written once. Conversion to TimestampType truncates
  * to microseconds, matching DuckDB's µs TIMESTAMP semantics.
  *
  * Window starts are reported as epoch seconds (BIGINT) so oracle comparison
  * never depends on timestamp-type hashing.
  */
object EventsAnalytics {

  private def norm(events: DataFrame): DataFrame = EventTime.toNanos(events)

  def withEventTime(events: DataFrame): DataFrame =
    EventTime.withTsd(events)

  private def decSum(c: String): Column =
    expr(s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)")

  /** Tumbling 1-hour windows per event type. */
  def tumbling(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(window(col("tsd"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), decSum("value").as("total"))
      .select(unix_timestamp(col("window.start")).as("hour_ts"),
        col("event_type"), col("n"), col("total"))

  /** Sliding 1-hour windows every 15 minutes (each event lands in 4). */
  def sliding(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(window(col("tsd"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"),
        col("event_type"), col("n"))

  /** 30-minute-gap sessionization per user. */
  def sessions(events: DataFrame): DataFrame =
    withEventTime(events)
      .groupBy(session_window(col("tsd"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), decSum("value").as("total"))
      .select(col("user_id"),
        unix_timestamp(col("session_window.start")).as("session_start"),
        col("n_events"), col("total"))

  /** Per-user ordering: row_number + lag over (ts, event_id) — the tie-break
    * on event_id keeps output deterministic across engines.
    */
  def rankLag(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(col("event_id"), col("user_id"),
      row_number().over(w).cast("long").as("rn"),
      lag(col("event_id"), 1).over(w).as("prev_event"))
  }

  /** Capped sessionization — the production telemetry variant of
    * [[sessions]]: a session ends at a `gapNs` inactivity gap OR when it
    * reaches `capNs` total duration (real sessionizers cap runaway
    * sessions from bots and dangling clients). Gap sessions are the
    * gaps-and-islands window (boundary flag via lag, running sum per
    * user); the cap then slices each island at FIXED offsets from its
    * start (`(ts − island_start) div capNs`) — closed-form, so the whole
    * operator is two user-keyed window passes + one aggregate, identical
    * in SQL, with no sequential per-user fold. Ties order by (ts,
    * event_id) for cross-engine determinism.
    */
  /** Per-event (island, slice) assignment of [[sessionsCapped]] — exposed
    * so the streaming face's emissions can be parity-checked row by row.
    */
  def sessionAssignments(
      events0: DataFrame,
      gapNs: Long = 1800000000000L,
      capNs: Long = 7200000000000L): DataFrame = {
    val events = norm(events0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("new_island",
        (coalesce(col("ts") - lag(col("ts"), 1).over(w), lit(gapNs + 1)) >
          lit(gapNs)).cast("long"))
      .withColumn("island", sum(col("new_island")).over(wCum))
      .withColumn("island_start",
        min(col("ts")).over(Window.partitionBy(col("user_id"), col("island"))))
      .withColumn("slice", expr(s"(ts - island_start) div ${capNs}"))
  }

  def sessionsCapped(
      events0: DataFrame,
      gapNs: Long = 1800000000000L,   // 30 min
      capNs: Long = 7200000000000L    // 2 h
  ): DataFrame =
    sessionAssignments(events0, gapNs, capNs)
      .groupBy(col("user_id"), col("island"), col("slice"))
      .agg(count(lit(1)).as("n_events"),
        expr("CAST(min(ts) AS BIGINT) div 1000").as("session_start_us"),
        decSum("value").as("total"))

  /** SCD-2 AS-OF-time query: the dimension state at one past instant —
    * the time-travel read every warehouse runs against a type-2 dimension
    * ("what was each user's state at T?"). The snapshot relation is
    * [[scd2Snapshot]]; the as-of filter keeps the validity row covering
    * `T` (here min(ts) + `offsetNs`, a deterministic corpus-relative
    * instant). One broadcast scalar + a map-side filter on the snapshot.
    */
  def scd2AsOf(events0: DataFrame,
      offsetNs: Long = 86400000000000L): DataFrame = {
    val events = norm(events0)
    val t0 = events.agg((min(col("ts")) + lit(offsetNs)).as("t_as_of"))
    scd2Snapshot(events).crossJoin(broadcast(t0))
      .filter(col("valid_from") <= col("t_as_of") &&
        (col("valid_to").isNull || col("valid_to") > col("t_as_of")))
      .select(col("user_id"), col("state"),
        expr("valid_from div 1000").as("valid_from_us"))
  }

  /** Per-type linear TREND of value over time — the drift/trend detector
    * a metrics pipeline fits per series: the least-squares slope of
    * (cents, epoch-second) pairs from EXACT integer moments (n, Σx, Σy,
    * Σxy, Σx² in DECIMAL(38,0) — the [[covarianceStats]] discipline),
    * emitted as pure fixed point `(|nΣxy − ΣxΣy| · 10¹²) div (nΣx² −
    * (Σx)²)` with an explicit sign — NO float anywhere, because at these
    * magnitudes (~1e26) even a single DECIMAL→DOUBLE cast is
    * engine-rounding-sensitive (measured: a 1-ulp DuckDB/Spark divergence)
    * and negative integral division floors vs truncates differently
    * across engines. Timestamps center on the corpus start (one broadcast
    * scalar) so the scaled numerator stays inside DECIMAL(38,0).
    */
  def trendSlopes(events0: DataFrame): DataFrame = {
    val events = norm(events0)
    val d = "DECIMAL(38,0)"
    val x0 = events.agg(min(expr("ts div 1000000000")).as("x0"))
    events.crossJoin(broadcast(x0))
      .select(col("event_type"),
        expr(s"CAST(ts div 1000000000 - x0 AS $d)").as("x"),
        expr(s"CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS $d)")
          .as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast(d).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
      .select(col("event_type"), col("n").cast("long").as("n"),
        expr("CAST(CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END AS INT)")
          .as("slope_sign"),
        expr("CAST((abs(n * sxy - sx * sy) * 1000000000000) div " +
          "(n * sxx - sx * sx) AS BIGINT)").as("slope_abs_pico"))
  }

  /** JSON property extraction from the `props` string column. */
  def jsonProps(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** SCD-2 dimension snapshot from a change-event stream (the CDC merge
    * shape of a warehouse dimension load): collapse each per-user run of
    * equal `event_type` into one validity row [valid_from, valid_to), the
    * open run flagged current. One shuffle on user_id feeds both window
    * passes (change detection via lag, validity close via lead); ties
    * break on event_id so output is deterministic across engines.
    */
  def scd2Snapshot(events0: DataFrame): DataFrame = {
    val events = norm(events0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = events
      .withColumn("prev_state", lag(col("event_type"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("event_type"))
    changes
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.cast("int").as("is_current"))
  }

  /** Per-type z-score outlier flags with NO division, square root, or
    * floating point anywhere in the decision — the anomaly-detection
    * monitor that must produce identical verdicts on any engine and any
    * partitioning. |x − μ| > kσ is cross-multiplied into integers:
    * (n·x − s)² > k²(n·q − s²) with s = Σx, q = Σx² over integer cents
    * (value is a 2-decimal amount; CAST to DECIMAL(18,2) matches DuckDB's
    * rounding bit-for-bit, as decSum relies on). k = 2.
    *
    * Range analysis (documented like keywordSearch's fixed point): cents
    * ≤ 1e7, so with group rows n ≤ 1e12: |n·x − s| ≤ 1e19 (DECIMAL(19,0)),
    * its square ≤ 1e38 (DECIMAL(38,0)), q ≤ n·1e14 — q and n·q stay inside
    * DECIMAL(38,0) up to ~1e12-row groups; beyond that, widen the cents
    * scale down (dollars) before the sums. The oracle runs the same
    * integers in HUGEINT. Per-type stats are a broadcast (few types), so
    * the fact side never shuffles; the flag is a map-side projection.
    */
  def valueOutliers(events: DataFrame): DataFrame = {
    val v = events.select(col("event_id"), col("event_type"), col("value"),
      expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("vc"))
    val stats = v.groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(col("vc")).as("s"),
      sum(expr("CAST(vc AS DECIMAL(19,0)) * vc")).as("q"))
    v.join(broadcast(stats), "event_type")
      .withColumn("d", expr(
        "CAST(CAST(n AS DECIMAL(19,0)) * vc - CAST(s AS DECIMAL(19,0)) AS DECIMAL(19,0))"))
      .select(col("event_id"), col("event_type"), col("value"),
        expr("CAST(d * d > 4 * (CAST(n AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0)) " +
          "- CAST(s AS DECIMAL(19,0)) * CAST(s AS DECIMAL(19,0))) AS INT)")
          .as("is_outlier"))
  }

  /** Per-type winsorization (outlier capping) at exact RANK-based
    * percentiles: clip each value to [p05, p95] of its event_type, where
    * the caps are the values at ranks ceil(p·n/100) under the total order
    * (value, event_id) — no interpolation, so the caps are actual data
    * values and every engine computes the identical clip. Values pass
    * through unclipped arithmetic (least/greatest only), keeping the
    * double column hash-identical across engines.
    *
    * Scale shape: one shuffle on event_type for the rank window; the caps
    * are a per-type 2-value aggregate joined back as a broadcast. Few
    * types ⇒ each type's sort is a big per-partition job — the same skew
    * note as any per-category quantile; a corpus with billions per type
    * would switch the cap computation to a sampled/sketched quantile and
    * keep the clip identical.
    */
  def winsorize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val ranked = events
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"), col("value"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1))
        .over(Window.partitionBy(col("event_type"))))
    val caps = ranked.groupBy(col("event_type")).agg(
      max(when(col("rn") === greatest(lit(1L), expr("(n*5+99) div 100")),
        col("value"))).as("lo"),
      max(when(col("rn") === expr("(n*95+99) div 100"), col("value")))
        .as("hi"))
    ranked.join(broadcast(caps), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("lo")), col("hi")).as("value_w"))
  }

  /** Pareto skyline of events on (value maximize, ts minimize) — every
    * event no other event strictly dominates ("at least as high a value,
    * at least as early, better on one"). Duplicate points all survive, as
    * in the standard skyline definition (Börzsönyi, Kossmann & Stocker,
    * "The Skyline Operator", ICDE 2001).
    *
    * Distributed shape — the classic two-phase skyline: a LOCAL skyline
    * per partition (sortWithinPartitions + one O(1)-memory scan; no
    * global window, which Spark would execute on a single task), then the
    * same scan over the unioned local skylines on one partition. A point
    * outside the global skyline is dominated by some point in its own
    * partition's local skyline, so phase 1 loses nothing; phase 2's input
    * is partitions × |local skyline| — 2-D skylines of real data are tiny
    * (expected O(log n) for independent dims), and a pathological
    * anti-correlated corpus degrades phase 2 to a big single-task sort,
    * not a wrong answer.
    *
    * The scan keeps a row iff its ts equals its value-group's minimum and
    * beats the running minimum ts of all strictly-higher value groups —
    * exactly "not dominated" under (value desc, ts asc) order.
    */
  def skyline(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    // µs image of the ns longs: DuckDB TIMESTAMPs carry µs, so comparing
    // (and emitting) the µs truncation keeps both engines on identical data
    val pts = norm(events)
      .filter(col("value").isNotNull && col("ts").isNotNull)
      .select(col("event_id"), col("value"), expr("ts div 1000").as("ts_us"))
    val enc = RowEncoder.encoderFor(StructType(Seq(
      StructField("event_id", LongType), StructField("value", DoubleType),
      StructField("ts_us", LongType))))
    def pass(df: DataFrame): DataFrame =
      df.sortWithinPartitions(col("value").desc, col("ts_us").asc)
        .mapPartitions { rows =>
          var prev = 0d; var seen = false
          var strictMin = Long.MaxValue // min ts over strictly greater values
          var groupMin = Long.MaxValue  // min ts of the current value group
          rows.flatMap { r =>
            val v = r.getDouble(1); val ts = r.getLong(2)
            if (!seen || v != prev) {
              strictMin = math.min(strictMin, groupMin)
              groupMin = ts // sorted ts-ascending: first of group is its min
              prev = v; seen = true
            }
            if (ts == groupMin && ts < strictMin) Some(r) else None
          }
        }(enc)
    // spread the single-row-group fixture scan before phase 1; at real
    // scale the source arrives multi-partition and this hash spread is the
    // only shuffle in the operator
    pass(pass(pts.repartition(col("event_id"))).coalesce(1))
  }

  /** Fixed-grid resample with last-observation-carried-forward — the
    * time-series gap-fill/align shape (metrics dashboards, feature grids):
    * per user, an hourly grid spanning that user's observed range; hours
    * with events report the LAST value in the hour (struct-max on
    * (ts, event_id), no window needed), empty hours carry the previous
    * filled value forward. The grid is generated per user by
    * sequence+explode, so its size is bounded by each user's own span —
    * no global calendar relation, no cross-user skew. Shuffles only on the
    * semantic keys: (user_id, hour) for the hourly rollup, user_id for the
    * forward-fill window. `value_filled` is never NULL because every
    * user's grid starts at an observed hour. Values pass through from
    * parquet untouched (no arithmetic), so the double column hashes
    * identically across engines.
    */
  def gapFill(events0: DataFrame): DataFrame = {
    val events = norm(events0)
    val hourly = events
      .groupBy(col("user_id"), expr("ts div 3600000000000").as("hour_bucket"))
      .agg(max(struct(col("ts"), col("event_id"), col("value")))
        .getField("value").as("last_value"),
        count(lit(1)).as("n_obs"))
    val grid = hourly.groupBy("user_id")
      .agg(min("hour_bucket").as("lo"), max("hour_bucket").as("hi"))
      .select(col("user_id"), explode(expr("sequence(lo, hi)")).as("hour_bucket"))
    val w = Window.partitionBy("user_id").orderBy("hour_bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour_bucket"), "left")
      .select(col("user_id"), col("hour_bucket"),
        last(col("last_value"), ignoreNulls = true).over(w).as("value_filled"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
  }

  /** Exponentially-weighted moving average per user — the smoothing pass of
    * a metric/anomaly pipeline — kept hash-exact by making the weights
    * DYADIC: alpha = 1/2 over the last `terms` observations, so every
    * weight is a power of two and the weighted sum is pure BIGINT
    * arithmetic on millisecond-quantized values (`floor(value*1000)`).
    * The emitted `ewma` double is one IEEE divide of two exact integers
    * (weighted sum / total weight), identical in any engine — no running
    * float accumulation whose order could differ.
    *
    * Scale shape: all `terms` lagged terms share ONE window spec, so
    * Catalyst evaluates them in a single Window operator — one shuffle on
    * user_id, one per-partition sort, O(terms) per row, O(1) state. The
    * truncation to a fixed horizon is what makes the operator streamable
    * (a `terms`-row buffer per key) and the weights' geometric decay makes
    * the truncation error < 2^-terms of the true infinite EWMA.
    */
  /** Shared EWMA core: per event, the dyadic weighted sum `ewma_scaled`
    * and total weight `w_tot` over the last `terms` quantized values —
    * all lag terms under ONE window spec (single Window operator, one
    * user_id shuffle).
    */
  private def ewmaCore(events0: DataFrame, terms: Int, quantScale: Long)
      : DataFrame = {
    require(terms >= 1 && terms <= 62, s"terms must be in [1, 62], got $terms")
    val events = norm(events0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val base = events.select(col("event_id"), col("user_id"), col("ts"),
      floor(col("value") * quantScale).cast("long").as("q"))
    def lagQ(j: Int): Column = if (j == 0) col("q") else lag(col("q"), j).over(w)
    val weighted = (0 until terms)
      .map(j => coalesce(lagQ(j), lit(0L)) * lit(1L << (terms - 1 - j)))
      .reduce(_ + _)
    val wTot = (0 until terms)
      .map(j => when(lagQ(j).isNotNull, lit(1L << (terms - 1 - j))).otherwise(lit(0L)))
      .reduce(_ + _)
    base.select(col("event_id"), col("user_id"), col("ts"), col("q"),
      weighted.as("ewma_scaled"), wTot.as("w_tot"))
  }

  def ewma(events0: DataFrame, terms: Int = 16, quantScale: Long = 1000L): DataFrame =
    ewmaCore(events0, terms, quantScale)
      .select(col("event_id"), col("user_id"), col("ewma_scaled"),
        (col("ewma_scaled").cast("double") /
          (col("w_tot") * quantScale).cast("double")).as("ewma"))

  /** Multiplicative burst/drop alarm against the running EWMA — the
    * classic rate-anomaly detector: flag an event whose value exceeds
    * `factor`× its user's PREVIOUS smoothed level (burst) or falls below
    * 1/`factor` of it (drop). The comparison cross-multiplies the exact
    * integers (`q · w_tot_prev` vs `factor · ewma_scaled_prev`), so no
    * division and no float enters the verdict; heavy-tailed metrics make
    * additive thresholds useless, which is why the alarm is a ratio.
    * Same single-shuffle window shape as [[ewma]] (the previous-row
    * sums are one more lag over the same window spec).
    */
  def ewmaAnomaly(events0: DataFrame, factor: Long = 4L, terms: Int = 16,
      quantScale: Long = 1000L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ewmaCore(events0, terms, quantScale)
      .select(col("event_id"), col("user_id"), col("q"),
        lag(col("ewma_scaled"), 1).over(w).as("pws"),
        lag(col("w_tot"), 1).over(w).as("pwt"))
      .filter(col("pws").isNotNull)
      .select(col("event_id"), col("user_id"), col("q"), col("pws"), col("pwt"),
        when(col("q") * col("pwt") > lit(factor) * col("pws"), lit("burst"))
          .when(lit(factor) * col("q") * col("pwt") < col("pws"), lit("drop"))
          .otherwise(lit(null)).as("kind"))
      .filter(col("kind").isNotNull)
  }

  /** Windowed event dedup — the telemetry/at-least-once-delivery cleaner:
    * within each (user, event_type) stream, an event is a duplicate if it
    * arrives within `gapNs` of the previous KEPT event; kept events are
    * the firsts of the gap-separated bursts (exactly the batch shape of
    * streaming `dropDuplicatesWithinWatermark`). Burst starts fall out of
    * one lag (gap > threshold opens a burst), and the burst id is the
    * running count of starts — one window shuffle on (user_id,
    * event_type), no self-join. Emits kept events with their burst's
    * duplicate count (n_dropped = burst size − 1).
    *
    * Chained-burst semantics on purpose: a chain of events each within
    * `gapNs` of the NEXT keeps only the chain's head even if the tail is
    * far from it — dedup against the previous RAW event would instead
    * re-keep inside a long burst. (lag is over raw events; a burst's
    * internal gaps are all ≤ threshold by construction, so
    * "gap from previous raw" and "gap from burst head" open bursts at
    * the same rows.)
    */
  def windowDedup(events0: DataFrame, gapNs: Long = 300000000000L): DataFrame = {
    val events = norm(events0)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val marked = events
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
        when(col("ts") - lag(col("ts"), 1).over(w) <= gapNs, 0L)
          .otherwise(1L).as("is_start"))
      .withColumn("burst", sum(col("is_start")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // each burst contains exactly one start row — its head is the keeper
    marked
      .groupBy(col("user_id"), col("event_type"), col("burst"))
      .agg(max(when(col("is_start") === 1L, col("event_id")))
          .as("kept_event_id"),
        (count(lit(1)) - 1L).as("n_dropped"))
      .select(col("kept_event_id"), col("user_id"), col("event_type"),
        col("n_dropped"))
  }

  /** First-order Markov transition counts over each user's event stream —
    * the "user journey" matrix (which event types follow which): one lag
    * per user ordered by (ts, event_id), then a global count per
    * (from_type, to_type) with the distinct-user support. One shuffle on
    * user_id for the ordering window; the transition matrix itself is
    * |event_types|² rows — driver-safe at any corpus size.
    */
  def transitions(events0: DataFrame): DataFrame = {
    val events = norm(events0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type").as("to_type"),
        lag(col("event_type"), 1).over(w).as("from_type"))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
  }

  /** Watermark advisor: the event-time LATENESS histogram — for each
    * event in arrival order (`event_id` = ingest sequence), how far its
    * timestamp lags the maximum timestamp already seen, banded to minutes
    * and capped. This is THE empirical input for choosing a Structured
    * Streaming watermark (`withWatermark` delay = the band covering the
    * tail you're willing to wait for); guessing it instead silently drops
    * late data or holds state forever.
    *
    * The global running max is a sequential scan by definition — so it is
    * computed as a DISTRIBUTED PREFIX SCAN, never one partition: bucket
    * arrivals by `event_id div bucketSize`, (1) per-bucket max (map-side
    * combine), (2) exclusive prefix max ACROSS buckets — a window over
    * the |buckets|-row relation only, (3) within-bucket running max — a
    * window partitioned BY BUCKET, so every partition works in parallel.
    * seen-before-max = max(prefix, within-bucket); identical to the
    * single-partition window (the oracle states it that way), parallel at
    * any scale.
    */
  def latenessProfile(
      events0: DataFrame,
      bucketSize: Long = 65536L,
      bandNs: Long = 60000000000L,
      maxBand: Long = 64L): DataFrame = {
    val events = norm(events0)
    val b = events.select(col("event_id"), col("ts"))
      .withColumn("bucket", expr(s"event_id div $bucketSize"))
    val wBuckets = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefix = b.groupBy(col("bucket")).agg(max(col("ts")).as("bmax"))
      .withColumn("prefix_max", max(col("bmax")).over(wBuckets))
      .select(col("bucket"), col("prefix_max"))
    val wIn = Window.partitionBy(col("bucket")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(broadcast(prefix), Seq("bucket"))
      .withColumn("seen_max",
        greatest(col("prefix_max"), max(col("ts")).over(wIn)))
      .withColumn("lateness",
        greatest(lit(0L), coalesce(col("seen_max") - col("ts"), lit(0L))))
      .groupBy(least(lit(maxBand), expr(s"lateness div $bandNs"))
        .as("lateness_band_min"))
      .agg(count(lit(1)).as("n"), max(col("lateness")).as("max_lateness_ns"))
  }

  /** Integer-exact bivariate profile: per event type, the raw second
    * moments of (value, hour-of-day) as exact BIGINTs plus the scaled
    * covariance / variance numerators (`n·Σxy − Σx·Σy`, computed in
    * DECIMAL(38,0) and emitted as the double image) — the
    * correlation-screen a profiling pass runs to find which metrics move
    * together, with no float accumulation anywhere (the house rule that
    * makes the answer independent of partitioning). Values quantize to
    * milli-units first; one partial-aggregating groupBy total.
    */
  def covarianceStats(events0: DataFrame): DataFrame = {
    val events = norm(events0)
    def dec(c: String): Column = col(c).cast("decimal(38,0)")
    events
      .select(col("event_type"),
        expr("CAST(round(value * 1000, 0) AS BIGINT)").as("x"),
        expr("(ts div 3600000000000) % 24").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n"), col("sx"), col("sy"),
        col("sxy"), col("sxx"), col("syy"),
        (dec("n") * dec("sxy") - dec("sx") * dec("sy"))
          .cast("double").as("cov_num"),
        (dec("n") * dec("sxx") - dec("sx") * dec("sx"))
          .cast("double").as("var_x_num"),
        (dec("n") * dec("syy") - dec("sy") * dec("sy"))
          .cast("double").as("var_y_num"))
  }

  /** Top 3-step behavioral paths: the most common (step1, step2, step3)
    * event-type sequences across all users, with occurrence and
    * distinct-user support — the path-analysis generalization of the
    * first-order [[transitions]] matrix (funnel discovery rather than a
    * pre-declared funnel). One user_id shuffle feeds both `lead` terms
    * (shared window spec → a single Window operator); the path space is
    * |types|³-bounded so the aggregate output is tiny, and the final
    * top-k is a TakeOrdered (no global sort materialization).
    * (ts, event_id) is a total order — ties cannot reorder across runs.
    */
  def funnelPaths(events0: DataFrame, k: Int = 20): DataFrame = {
    val events = norm(events0)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("event_type").as("step1"),
        lead(col("event_type"), 1).over(w).as("step2"),
        lead(col("event_type"), 2).over(w).as("step3"))
      .filter(col("step2").isNotNull && col("step3").isNotNull)
      .groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(k)
  }

  /** Next-event prediction evaluation — the end-to-end train/eval loop of
    * the first-order Markov baseline every sequence model is benchmarked
    * against: split each user's stream at the 80% rank point (train =
    * earlier events, the standard temporal split), fit the argmax
    * transition table on train pairs (ties to the lexicographically
    * smallest successor — deterministic), then score accuracy on the
    * held-out pairs per antecedent type. Integer basis points; the
    * transition model is a |types|²-bounded broadcast.
    *
    * Two shuffles on the user (rank window + per-user counts,
    * co-partitioned), one on the type pair for the model, and a broadcast
    * join for scoring — at 100 TB the only data-sized orders are the
    * per-user windows, the same shape as every funnel/session key here.
    */
  def markovNextEval(events: DataFrame): DataFrame = {
    val e = EventTime.toNanos(events)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = e.select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rk", row_number().over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("prev_type").isNotNull)
    val trans = pairs.filter(col("rk") * 10 <= col("n") * 8)
      .groupBy(col("prev_type"), col("event_type")).agg(count(lit(1)).as("c"))
    val model = trans.withColumn("r", row_number().over(
        Window.partitionBy(col("prev_type"))
          .orderBy(col("c").desc, col("event_type"))))
      .filter(col("r") === 1)
      .select(col("prev_type"), col("event_type").as("pred_type"))
    pairs.filter(col("rk") * 10 > col("n") * 8)
      .join(broadcast(model), Seq("prev_type"), "left")
      .groupBy(col("prev_type"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("pred_type") === col("event_type"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("acc_bp", expr("(n_correct * 10000) div n_test"))
  }

  /** Mean-shift change-point statistic per event series — the
    * non-recursive CUSUM form (Page 1954's cumulative-sum idea, stated as
    * the max deviation of the value prefix sum from its uniform-rate
    * line, the same statistic the Kolmogorov–Smirnov location test
    * maximizes): `stat_t = |P_t·N − t·P_N|` over the (ts, event_id) order,
    * maximized over t. A regime change in the value level makes the
    * prefix path bow away from the straight line and the argmax lands at
    * the change point; a stable series stays near 0. Emitted per type:
    * the max statistic (integer — cents cross-multiplied by counts, no
    * division) and the event at the argmax (earliest on ties).
    *
    * All integer: values are exact DECIMAL(18,2) cents, the stat is a
    * cross-multiplication (no mean, no float). One window pass per type
    * (prefix sums + the per-type totals), then a grouped top-1 — the
    * row_number rewrite turns it into the bounded TopKPerKey operator.
    * The per-type total order is the inherent serial dimension of
    * change-point detection; at 100 TB shard the series (type, day) the
    * way the lateness profile does and maximize per shard.
    */
  def cusumShift(events: DataFrame): DataFrame = {
    val e = EventTime.toNanos(events)
    val ord = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val wCum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("event_type"))
    val pre = e.select(col("event_type"), col("ts"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("v"))
      .withColumn("t", row_number().over(ord).cast("long"))
      .withColumn("p", sum(col("v")).over(wCum))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("ptot", sum(col("v")).over(wAll))
      // cents-sum × count products overflow BIGINT at full corpus scale;
      // DECIMAL(38,0) matches the oracle's HUGEINT arithmetic exactly
      .withColumn("stat", abs(
        col("p").cast("decimal(38,0)") * col("n") -
          col("t").cast("decimal(38,0)") * col("ptot")))
    pre.withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("stat").desc, col("t"))))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n").as("n"),
        // emit the BIGINT image (the DECIMAL stays internal: the driver
        // compare is decimal-hostile — verify-skill lesson)
        col("stat").cast("long").as("stat_max"),
        col("event_id").as("shift_event_id"), col("t").as("shift_t"))
  }

  /** Multi-touch conversion attribution — the first-touch / last-touch /
    * linear credit models every marketing-analytics stack reports side by
    * side. A conversion (`convType` event) is attributed to the `channels`
    * touches of the SAME user inside the `lookbackNs` window before it;
    * credit is integer basis points per (conversion, touch): first/last
    * give the whole 10000 to the window-extreme touch, linear splits
    * `10000 div n` per touch with the remainder (`10000 mod n`) assigned
    * to the first touch — so each attributed conversion's credit sums to
    * exactly 10000 under every model and the corpus totals stay
    * hash-exact. Conversions with no touch in the window are unattributed
    * (they appear in no model — the "direct" bucket a report derives as
    * conversions minus attributed).
    *
    * Shape at scale: conversions and touches co-shuffle once on user_id
    * (the same key both relations naturally live on), the lookback is a
    * post-join range filter whose blow-up is bounded by per-user activity
    * inside one window — the events_asof class of temporal join; a user
    * hot enough to break that bound gets the [[graft.engine.Ops]]
    * time-binned range join instead. The credit windows partition by
    * (user, conversion) — never wider — and the final rollup is a
    * model × channel aggregate, parameter-sized output.
    */
  def attribution(events0: DataFrame, convType: String = "purchase",
      channels: Seq[String] = Seq("click", "view", "signup"),
      lookbackNs: Long = 86400L * 1000000000L): DataFrame = {
    val e = EventTime.toNanos(events0)
    val conv = e.filter(col("event_type") === convType)
      .select(col("user_id"), col("ts").as("cts"), col("event_id").as("cid"))
    val touch = e.filter(col("event_type").isin(channels: _*))
      .select(col("user_id"), col("ts").as("tts"),
        col("event_id").as("tid"), col("event_type").as("channel"))
    val j = conv.join(touch, Seq("user_id"))
      .filter(col("tts") < col("cts") && col("tts") >= col("cts") - lookbackNs)
    val wAsc = Window.partitionBy(col("user_id"), col("cid"))
      .orderBy(col("tts"), col("tid"))
    val wAll = Window.partitionBy(col("user_id"), col("cid"))
    val scored = j
      .withColumn("rk", row_number().over(wAsc).cast("long"))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("first_bp", when(col("rk") === 1L, 10000L).otherwise(0L))
      .withColumn("last_bp", when(col("rk") === col("n"), 10000L).otherwise(0L))
      .withColumn("linear_bp", expr("10000L div n") +
        when(col("rk") === 1L, expr("10000L % n")).otherwise(0L))
    scored
      .select(col("channel"), explode(array(
        struct(lit("first").as("model"), col("first_bp").as("bp")),
        struct(lit("last").as("model"), col("last_bp").as("bp")),
        struct(lit("linear").as("model"), col("linear_bp").as("bp")))).as("mc"))
      .select(col("mc.model").as("model"), col("channel"), col("mc.bp").as("bp"))
      .filter(col("bp") > 0L)
      .groupBy(col("model"), col("channel"))
      .agg(sum(col("bp")).as("credit_bp"), count(lit(1)).as("n_credited"))
  }

  /** Token-bucket rate limiting replayed over the event log — the
    * admission-control simulation run BEFORE a quota change ships: per
    * user, a bucket of `capacity` tokens refilling one per `refillNs`
    * decides every event (admit consumes a token; an empty bucket
    * rejects), and the output is the per-event admit/reject decision the
    * proposed quota WOULD have made on real traffic. All integer
    * arithmetic: whole-token refills advance the bucket clock by exactly
    * the credited intervals (the standard fractional-credit-preserving
    * form), so the fold replays bit-identically anywhere.
    *
    * Bucket state depends on every earlier event, so like
    * [[graft.analytics.Curation.docPackNextFit]] this is the honest
    * `mapPartitions` class: hash-partition by user, sort within
    * partitions by (user, ts, event_id), fold 3 longs of state per user.
    * One shuffle, O(1) memory, parallel across users.
    */
  def rateLimitAdmission(
      events0: DataFrame,
      capacity: Long = 3L,
      refillNs: Long = 3600L * 1000000000L): DataFrame = {
    require(capacity >= 1, "rateLimitAdmission: capacity >= 1")
    val e = EventTime.toNanos(events0)
    val spark = e.sparkSession
    import spark.implicits._
    e.select(col("user_id").cast("long"), col("ts").cast("long"),
      col("event_id").cast("long"))
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("ts"), col("event_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var cur = Long.MinValue
        var tok = 0L
        var last = 0L
        it.map { case (user, ts, id) =>
          if (user != cur) { cur = user; tok = capacity; last = ts }
          else {
            val refill = (ts - last) / refillNs
            if (tok + refill >= capacity) { tok = capacity; last = ts }
            else { tok += refill; last += refill * refillNs }
          }
          val admitted = if (tok >= 1) { tok -= 1; 1 } else 0
          (user, id, admitted)
        }
      }
      .toDF("user_id", "event_id", "admitted")
  }

  /** Lag-k autocorrelation of the hourly event-count series per event
    * type, in exact integer fixed point — the seasonality/persistence
    * screen run before fitting any forecasting model to an event stream
    * (a strong lag-24 ACF says "daily cycle", a near-zero lag-1 says the
    * EWMA smoother is doing nothing). The series is the DENSE hourly
    * count vector over each type's [min_hour, max_hour] span — missing
    * hours are real zeros, not skipped samples, so quiet periods
    * depress the ACF the way they should. Dense hours come from one
    * `sequence()` explode per type: the series length is bounded by the
    * time SPAN, not the corpus size, so the per-type window sort stays
    * bounded at any data scale (the counts aggregate is the only
    * corpus-sized pass).
    *
    * Exactness: Pearson r over the (x_t, x_{t+k}) pairs is a ratio of
    * integer moments; the signed SQUARE is emitted instead of r itself —
    * `r2_signed_ppm = sign(num) · 10^6·num² div (da·db)` with
    * `num = n·Σxy − Σx·Σy`, `da = n·Σx² − (Σx)²`, `db` likewise — so no
    * square root is ever taken and the DECIMAL(38,0) arithmetic matches
    * DuckDB's HUGEINT bit-for-bit. A zero-variance side (constant
    * series) emits 0.
    */
  def autocorrHourly(events0: DataFrame, lags: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), "autocorrHourly: lags >= 1")
    val hourNs = 3600L * 1000000000L
    val e = EventTime.toNanos(events0)
      .select(col("event_type"), expr(s"ts div $hourNs").as("hr"))
    val cnt = e.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("c"))
    val rng = cnt.groupBy(col("event_type"))
      .agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
    val dense = rng
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("hr"))
      .join(cnt, Seq("event_type", "hr"), "left")
      .na.fill(0L, Seq("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    val led = dense.select(
      (col("event_type") +: lags.map(k =>
        lead(col("c"), k).over(w).as(s"c$k"))) :+ col("c").as("c0"): _*)
    val perLag = lags.map { k =>
      led.filter(col(s"c$k").isNotNull)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n_pairs"),
          sum(col("c0")).as("sx"), sum(col(s"c$k")).as("sy"),
          sum(col("c0") * col("c0")).as("sxx"),
          sum(col(s"c$k") * col(s"c$k")).as("syy"),
          sum(col("c0") * col(s"c$k")).as("sxy"))
        .select(col("event_type"), lit(k).as("lag_k"), col("n_pairs"),
          (col("n_pairs") * col("sxy") - col("sx") * col("sy"))
            .cast("decimal(38,0)").as("num"),
          (col("n_pairs") * col("sxx") - col("sx") * col("sx"))
            .cast("decimal(38,0)").as("da"),
          (col("n_pairs") * col("syy") - col("sy") * col("sy"))
            .cast("decimal(38,0)").as("db"))
    }.reduce(_.unionAll(_))
    // magnitude via integral divide in DECIMAL, sign reapplied with a
    // `when` (SQL sign() returns DOUBLE on decimals — keep floats out)
    perLag
      .withColumn("mag", expr(
        // divisor guarded inline: ANSI mode evaluates this column even on
        // rows the zero-variance `when` below discards
        "(CAST(1000000 AS DECIMAL(38,0)) * num * num) div " +
          "(CASE WHEN da = 0 OR db = 0 THEN 1 ELSE da * db END)"))
      .select(col("event_type"), col("lag_k"), col("n_pairs"),
        when(col("da") === 0 || col("db") === 0, lit(0L))
          .when(col("num") < 0, -col("mag")).otherwise(col("mag"))
          .cast("long").as("r2_signed_ppm"))
  }

  /** Benford's-law first-significant-digit audit of event values (Benford
    * 1938; the fraud/synthetic-data screen): per digit 1–9, the observed
    * count, its exact share in ppm, the Benford expectation
    * log10(1+1/d) as a ppm literal (the nine constants sum to exactly
    * 10^6), and the absolute deviation. One map-only digit extraction
    * feeds a 9-row aggregate — the plan is a scan plus a tiny groupBy at
    * any corpus size. Values quantize to exact cents first so the digit
    * comes from an integer, never a float rendering.
    */
  def benfordFirstDigit(events: DataFrame): DataFrame = {
    // log10(1 + 1/d) in ppm, d = 1..9; rounded values sum to 10^6 exactly
    val benfordPpm =
      Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L, 57992L, 51153L, 45757L)
    val digits = events
      .select(expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .filter(col("cents") > 0)
      .select(expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)").as("digit"))
    val counts = digits.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm", expr("(1000000 * n) div n_total"))
      .withColumn("benford_ppm",
        element_at(array(benfordPpm.map(lit): _*), col("digit")))
      .select(col("digit"), col("n"), col("share_ppm"), col("benford_ppm"),
        abs(col("share_ppm") - col("benford_ppm")).as("dev_ppm"))
  }

  /** Inter-arrival-time spectrum: per event type, the histogram of
    * PER-USER gaps between consecutive events in power-of-two second
    * bands (band = bit length of seconds+1, so a 0-second gap lands in
    * band 0) — the burstiness fingerprint behind rate-limit and
    * bot-detection tuning. The lag window partitions by (user, type):
    * user-keyed, never corpus-sized. Integer epoch arithmetic only.
    */
  def interArrivalBands(events0: DataFrame): DataFrame = {
    val e = EventTime.toNanos(events0)
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    e.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("gap_ns", col("ts") - lag(col("ts"), 1).over(w))
      .withColumn("gap_s", expr("gap_ns div 1000000000"))
      .filter(col("gap_s").isNotNull)
      .withColumn("band", expr("CAST(length(bin(gap_s + 1)) - 1 AS INT)"))
      .groupBy(col("event_type"), col("band"))
      .agg(count(lit(1)).as("n"),
        min(col("gap_s")).as("min_s"), max(col("gap_s")).as("max_s"))
  }

  /** Robust daily-volume anomaly detection per event type: a day is
    * anomalous when its count deviates from the type's MEDIAN daily count
    * by more than `k`× the median absolute deviation — the
    * distribution-shaped outlier screen that, unlike the sequential EWMA /
    * CUSUM detectors, a single corrupted day cannot drag (median and MAD
    * have 50% breakdown; mean/stddev have 0%). Both medians are exact
    * power-of-two-fraction percentiles over integer counts (the
    * cross-engine-safe class); the flag comparison is the integer
    * cross-multiplication |2·(x − med)| > 2·k·MAD evaluated on doubled
    * values so the .5-interpolated medians stay integral. Day grid is the
    * DENSE per-type span (missing days are real zero-count anomalies).
    */
  def dailyVolumeAnomalies(events0: DataFrame, k: Int = 5): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val e = EventTime.toNanos(events0)
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"))
    val cnt = e.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val rng = cnt.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val dense = rng
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("day"))
      .join(cnt, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
    // med2 = 2·median is integral even when the median interpolates at .5
    val med = dense.groupBy(col("event_type"))
      .agg(expr("CAST(round(2 * percentile(c, 0.5), 0) AS BIGINT)").as("med2"))
    val dev = dense.join(broadcast(med), Seq("event_type"))
      .withColumn("absdev2", abs(col("c") * 2 - col("med2")))
    val mad = dev.groupBy(col("event_type"))
      .agg(expr("CAST(round(percentile(absdev2, 0.5), 0) AS BIGINT)").as("mad2"))
    dev.join(broadcast(mad), Seq("event_type"))
      .filter(col("absdev2") > lit(k.toLong) * col("mad2"))
      .select(col("event_type"), col("day"), col("c"),
        col("med2"), col("mad2"))
  }

  /** Local maxima of the DENSE hourly count series per event type (the
    * alerting primitive behind "traffic spiked at hour H"): an hour is a
    * peak when its count strictly exceeds both neighbors. Missing hours
    * inside each type's span are REAL ZEROS (a burst after silence is a
    * peak) via the same bounded `sequence()` fill as [[autocorrHourly]];
    * endpoints are excluded (no two-sided neighborhood). The window is
    * partitioned by event type over a time-span-bounded series — never
    * corpus-sized.
    */
  def peakHours(events0: DataFrame): DataFrame = {
    val hourNs = 3600L * 1000000000L
    val e = EventTime.toNanos(events0)
      .select(col("event_type"), expr(s"ts div $hourNs").as("hr"))
    val cnt = e.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("c"))
    val rng = cnt.groupBy(col("event_type"))
      .agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
    val dense = rng
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("hr"))
      .join(cnt, Seq("event_type", "hr"), "left")
      .na.fill(0L, Seq("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hr"))
    dense
      .withColumn("prev", lag(col("c"), 1).over(w))
      .withColumn("next", lead(col("c"), 1).over(w))
      .filter(col("prev").isNotNull && col("next").isNotNull &&
        col("c") > col("prev") && col("c") > col("next"))
      .select(col("event_type"), col("hr"), col("c"), col("prev"), col("next"))
  }

  /** Multiwindow error-budget burn-rate alerts (the Google SRE workbook
    * recipe): with a 99% SLO the error budget is 1%, the burn rate is
    * (error share)/(budget), and paging fires on a FAST window burning
    * ≥ 14.4× (2% of the 30-day budget in 1h) while ticketing fires on a
    * SLOW window ≥ 6× over 6h — two windows so a hard outage pages in
    * minutes and a slow leak still surfaces. Rates are exact milli via
    * floor division and the verdicts are integer cross-multiplications
    * (1000·e ≥ 144·t and 6000·e6 ≥ 360·t6... reduced: e·1000 ≥ 144·t,
    * e6·1000 ≥ 60·t6); the 6h sums ride a RANGE frame over the DENSE
    * hour grid (span-bounded, missing hours are real zero-traffic
    * hours that must not shrink the window).
    */
  def errorBudgetBurn(events0: DataFrame, errType: String = "error")
      : DataFrame = {
    val hourNs = 3600L * 1000000000L
    val e = EventTime.toNanos(events0)
      .select(expr(s"ts div $hourNs").as("hr"),
        (col("event_type") === errType).cast("long").as("is_err"))
    val cnt = e.groupBy(col("hr"))
      .agg(count(lit(1)).as("t"), sum(col("is_err")).as("er"))
    val rng = cnt.agg(min(col("hr")).as("mn"), max(col("hr")).as("mx"))
    val dense = rng
      .select(explode(sequence(col("mn"), col("mx"))).as("hr"))
      .join(cnt, Seq("hr"), "left")
      .na.fill(0L, Seq("t", "er"))
    val w6 = Window.orderBy(col("hr")).rangeBetween(-5, 0)
    dense
      .withColumn("t6", sum(col("t")).over(w6))
      .withColumn("e6", sum(col("er")).over(w6))
      .select(col("hr"), col("t"), col("er"),
        expr("CASE WHEN t = 0 THEN 0L ELSE (er * 100000L) div t END")
          .as("burn1_milli"),
        expr("CASE WHEN t6 = 0 THEN 0L ELSE (e6 * 100000L) div t6 END")
          .as("burn6_milli"),
        expr("CAST(er * 1000L >= 144L * t AND t > 0 AS INT)").as("page_fast"),
        expr("CAST(e6 * 1000L >= 60L * t6 AND t6 > 0 AS INT)").as("ticket_slow"))
  }

  /** Sample-ratio-mismatch check — the first gate of every A/B readout
    * (a 50/50 split whose arm counts differ beyond chance means broken
    * randomization, and every downstream metric is garbage; Fabijan et
    * al., "Diagnosing sample ratio mismatch", KDD 2019). Units are
    * DISTINCT users per event type (SRM is about randomization units,
    * not event volume); the χ² statistic for an even split is
    * (n_a−n_b)²/(n_a+n_b), carried as exact milli via floor division,
    * and the 95%/99% verdicts are integer cross-multiplications against
    * the FROZEN critical values 3.8415/6.6349 (×10⁴ literals — the
    * nDCG-discount trick). One distinct + one aggregate per type.
    */
  def srmCheck(events0: DataFrame): DataFrame =
    events0
      .select(col("event_type"), col("user_id"))
      .distinct()
      .withColumn("arm", expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) " +
          "AS BIGINT) % 2"))
      .groupBy(col("event_type"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"))
      .withColumn("z2_milli", expr(
        "((n_a - n_b) * (n_a - n_b) * 1000L) div (n_a + n_b)"))
      .withColumn("srm_95", expr(
        "CAST((n_a - n_b) * (n_a - n_b) * 10000L >= 38415L * (n_a + n_b) " +
          "AS INT)"))
      .withColumn("srm_99", expr(
        "CAST((n_a - n_b) * (n_a - n_b) * 10000L >= 66349L * (n_a + n_b) " +
          "AS INT)"))

  /** CUPED variance reduction (Deng, Xu, Kohavi & Walker, "Improving the
    * sensitivity of online controlled experiments by utilizing
    * pre-experiment data", WSDM 2013): adjust each unit's metric by its
    * pre-period covariate, Y' = Y − θ(X − X̄) with θ = cov(X,Y)/var(X),
    * which shrinks variance by the squared correlation without biasing
    * the treatment delta. Units are users; X = first-half purchase
    * cents, Y = second-half (the usual pre/post split around the exact
    * range midpoint); arms are the md5 user split. EVERYTHING is exact
    * rational arithmetic over DECIMAL(38,0) sums — the per-arm adjusted
    * mean ships as the single floor division of the common-denominator
    * form (n_a·D·n, D = nΣxx−(Σx)²), so any engine reproduces it
    * bit-for-bit. Bound: products stay inside DECIMAL(38) up to ~10⁶
    * units at cent scale; beyond that pre-scale X/Y to coarser units.
    * Degenerate var(X)=0 falls back to the unadjusted mean. One scan +
    * one user-keyed aggregate + arms-sized algebra.
    */
  def cupedAdjustment(events0: DataFrame): DataFrame = {
    val d = "DECIMAL(38,0)"
    val e = EventTime.toNanos(events0)
    val mid = e.agg(expr("(min(ts) + max(ts)) div 2").as("mid_ns"))
    val units = e.crossJoin(broadcast(mid))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(
        expr("CAST(sum(CASE WHEN ts < mid_ns THEN " +
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) " +
          s"AS $d)").as("x"),
        expr("CAST(sum(CASE WHEN ts >= mid_ns THEN " +
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) ELSE 0 END) " +
          s"AS $d)").as("y"))
      .withColumn("arm", expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) " +
          "AS BIGINT) % 2"))
    val glob = units.agg(count(lit(1)).cast(d).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
    units
      .groupBy(col("arm"))
      .agg(count(lit(1)).cast(d).as("na"),
        sum(col("x")).as("sxa"), sum(col("y")).as("sya"))
      .crossJoin(broadcast(glob))
      .withColumn("dd", expr("n * sxx - sx * sx"))
      .withColumn("nt", expr("n * sxy - sx * sy"))
      .select(col("arm").cast("long").as("arm"),
        col("na").cast("long").as("n_units"),
        expr("CAST(sya div na AS BIGINT)").as("raw_mean_cents"),
        expr("CAST(CASE WHEN dd = 0 THEN (1000 * sya) div na " +
          "ELSE (1000 * (sya * dd * n - nt * (sxa * n - sx * na))) " +
          "div (na * dd * n) END AS BIGINT)").as("cuped_mean_milli"),
        expr("CAST(CASE WHEN dd = 0 THEN 0 " +
          "ELSE (nt * 1000000) div dd END AS BIGINT)").as("theta_ppm"))
  }

  /** Minimum detectable effect (MDE) planning per event type — the power
    * calculation every experiment design starts from: for a 50/50 split
    * of the observed user base, the smallest absolute lift in the
    * type's user-conversion rate a two-sided α = 0.05 test detects with
    * 80% power, mde = (z_{α/2} + z_β)·√(2p(1−p)/n_arm). The z-sum is the
    * FROZEN micro literal 7848851 ((1.959964 + 0.841621)² × 10⁶ — the
    * χ²-critical discipline), the radicand is exact DECIMAL integer
    * algebra in ppm², and the root is float sqrt with the integer ±1
    * repair (the `source_mixture_plan` isqrt idiom) — bit-stable on any
    * engine. One distinct + two aggregates; output is types-sized.
    */
  def mdePower(events0: DataFrame): DataFrame = {
    val u = events0.select(col("event_type"), col("user_id")).distinct()
    val nAll = u.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n_users"))
    u.groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
      .crossJoin(broadcast(nAll))
      .withColumn("n_arm", expr("greatest(1L, n_users div 2)"))
      .withColumn("p_ppm", expr("(n_t * 1000000L) div n_users"))
      .withColumn("mde2", expr(
        "CAST((CAST(7848851 AS DECIMAL(38,0)) * 2 * p_ppm * " +
          "(1000000 - p_ppm)) div (1000000 * n_arm) AS BIGINT)"))
      .withColumn("s0", expr("CAST(floor(sqrt(CAST(mde2 AS DOUBLE))) AS BIGINT)"))
      .select(col("event_type"), col("n_users"), col("n_arm"), col("p_ppm"),
        expr("CASE WHEN (s0 + 1) * (s0 + 1) <= mde2 THEN s0 + 1 " +
          "WHEN s0 * s0 > mde2 THEN s0 - 1 ELSE s0 END").as("mde_ppm"))
  }

  /** Wald SPRT sequential monitor (Wald, "Sequential Tests of Statistical
    * Hypotheses", Ann. Math. Stat. 1945) — the always-valid daily gate an
    * experiment dashboard polls without inflating false positives the way
    * repeated fixed-horizon tests do. Tests the event stream's daily
    * success rate (H0: p = 1/5 vs H1: p = 1/4, the fixture's conversion
    * neighborhood) by the cumulative log-likelihood ratio: each success
    * adds ln(p1/p0), each failure ln((1−p1)/(1−p0)), and the run stops
    * when the sum crosses ln((1−β)/α) (accept H1) or ln(β/(1−α)) (accept
    * H0). All transcendentals are FROZEN micro-scaled integer literals
    * (the χ²-critical discipline of [[srmCheck]]): +223144 / −64539 per
    * event and ±2944439 for α = β = 0.05, so the whole monitor is one
    * integer cumulative sum any engine replays bit-for-bit. Output: one
    * row per day on the dense grid with the cumulative LLR and the
    * decision state (−1 accept H0, 0 continue, +1 accept H1). The
    * cumulative window runs over the span-bounded dense day grid.
    */
  def sprtMonitor(
      events0: DataFrame, successType: String = "purchase"): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val daily = EventTime.toNanos(events0)
      .groupBy(expr(s"ts div $dayNs").as("day"))
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === successType).cast("long")).as("s"))
    val rng = daily.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val dense = rng
      .select(explode(sequence(col("mn"), col("mx"))).as("day"))
      .join(daily, Seq("day"), "left")
      .na.fill(0L, Seq("n", "s"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense
      .withColumn("llr_micro",
        sum(expr("s * 223144L - (n - s) * 64539L")).over(w))
      .select(col("day"), col("n"), col("s"), col("llr_micro"),
        when(col("llr_micro") >= 2944439L, 1)
          .when(col("llr_micro") <= -2944439L, -1)
          .otherwise(0).as("decision"))
  }

  /** Winsorized mean of per-user purchase revenue — the standard
    * heavy-tail guard for A/B revenue metrics (cap each unit at the p95
    * of unit totals before averaging; one whale stops moving the mean).
    * The cap is carried as the EXACT 20× image of the 0.95 quantile
    * (0.95·(n−1) has a fractional part that is a multiple of 1/20, so
    * 20× the linear interpolation is integral — the doubled-median trick
    * at p95), the winsorized totals as 20× integers, and both means as
    * floor-divided milli-cents. One user-keyed aggregate + a broadcast
    * one-row cap.
    */
  def winsorizedMetric(events0: DataFrame): DataFrame = {
    val units = events0
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(expr("sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))")
        .as("cents"))
    val cap = units.agg(expr(
      "CAST(round(percentile(cents, 0.95) * 20) AS BIGINT)").as("cap_x20"))
    units.crossJoin(broadcast(cap))
      .agg(count(lit(1)).as("n_users"),
        sum(col("cents")).as("s"),
        sum(least(expr("cents * 20"), col("cap_x20"))).as("sw_x20"),
        first(col("cap_x20")).as("cap_x20"))
      .select(col("n_users"),
        expr("CASE WHEN n_users = 0 THEN 0L " +
          "ELSE (s * 1000L) div n_users END").as("mean_milli"),
        expr("CASE WHEN n_users = 0 THEN 0L " +
          "ELSE (sw_x20 * 50L) div n_users END").as("win_mean_milli"),
        coalesce(col("cap_x20"), lit(0L)).as("cap_x20"))
  }

  /** Leave-one-bucket-out jackknife for a ratio metric (Quenouille/Tukey;
    * the delta-method alternative used when units are too many to
    * resample individually): average order value = purchase cents per
    * purchase event, with events hashed into md5 buckets and the ratio
    * recomputed with each bucket held out. Per-bucket long format —
    * (bucket, n, cents, leave-one-out ratio, its delta from the full
    * ratio) — from which the jackknife variance is one trivial rollup;
    * everything is exact integer floor division on both engines. One
    * scan, one buckets-sized aggregate, a broadcast one-row total.
    */
  def ratioJackknife(events0: DataFrame, nBuckets: Int = 16): DataFrame = {
    require(nBuckets >= 2, s"ratioJackknife: nBuckets >= 2, got $nBuckets")
    val per = events0
      .filter(col("event_type") === "purchase")
      .select(expr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 6), 16, 10) " +
          s"AS BIGINT) % $nBuckets").as("bucket"),
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("nb"), sum(col("cents")).as("sb"))
    val tot = per.agg(sum(col("nb")).as("n"), sum(col("sb")).as("s"))
    per.crossJoin(broadcast(tot))
      .select(col("bucket"), col("nb"), col("sb"),
        expr("(s * 1000L) div n").as("r_full_milli"),
        expr("CASE WHEN n = nb THEN 0L " +
          "ELSE ((s - sb) * 1000L) div (n - nb) END").as("r_loo_milli"))
      .withColumn("d_milli", expr("r_loo_milli - r_full_milli"))
  }

  /** Seasonal-naive forecast backtest — the baseline every revenue
    * forecast must beat (forecast(d) = actual(d − 7), the same weekday
    * last week) evaluated on each type's LAST 14 days: MAE in exact
    * cents and mean absolute percentage error in exact bp (per-day APE
    * floor-divided against max(1, actual) so zero-revenue days are
    * defined, then integer-averaged — the documented quantization).
    * Runs on the dense zero-filled day grid (a missing day is a real
    * zero the naive forecast must also predict); windows are type-keyed
    * over the span-bounded series.
    */
  def seasonalNaiveBacktest(events0: DataFrame, season: Int = 7,
      horizon: Int = 14): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val daily = EventTime.toNanos(events0)
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(expr("CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)")
        .as("cents"))
    val rng = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val dense = rng
      .select(col("event_type"), col("mn"), col("mx"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("cents"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    dense
      .withColumn("fc", lag(col("cents"), season).over(w))
      .filter(col("day") > col("mx") - horizon && col("fc").isNotNull)
      .withColumn("ae", abs(col("cents") - col("fc")))
      .withColumn("ape_bp", expr("(ae * 10000L) div greatest(1L, cents)"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        expr("sum(ae) div count(1)").as("mae_cents"),
        expr("sum(ape_bp) div count(1)").as("mape_bp"))
  }

  /** Offline policy evaluation by REPLAY (Li, Chu, Langford & Wang,
    * "Unbiased offline evaluation of contextual-bandit-based news
    * article recommendation algorithms", WSDM 2011): when the logged
    * arm was chosen uniformly at random, restricting to the events
    * where the logged arm AGREES with the candidate policy's choice
    * gives an unbiased estimate of that policy's online reward — no
    * live experiment needed. Logged arms and both candidate policies
    * are deterministic md5 draws (logging: per event; "hash" policy:
    * per user; "fixed" policy: always arm 0), reward is the purchase
    * value in cents, so every estimate is an exact integer ratio.
    * One scan, per-policy conditional aggregates; output is
    * policies-sized.
    */
  def banditReplayEval(events0: DataFrame, nArms: Int = 3): DataFrame = {
    require(nArms >= 1, s"banditReplayEval: nArms >= 1, got $nArms")
    val e = events0
      .withColumn("arm_log", expr(
        "CAST(conv(substring(md5(concat('log-', CAST(event_id AS STRING))), " +
          s"1, 6), 16, 10) AS BIGINT) % $nArms"))
      .withColumn("arm_hash", expr(
        "CAST(conv(substring(md5(concat('tgt-', CAST(user_id AS STRING))), " +
          s"1, 6), 16, 10) AS BIGINT) % $nArms"))
      .withColumn("reward_cents", expr(
        "IF(event_type = 'purchase', " +
          "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT), 0L)"))
    def replay(name: String, matched: org.apache.spark.sql.Column) =
      e.agg(count(lit(1)).as("n_total"),
        sum(when(matched, 1L).otherwise(0L)).as("n_matched"),
        sum(when(matched, col("reward_cents")).otherwise(0L)).as("reward_cents"))
        .select(lit(name).as("policy"), col("n_total"), col("n_matched"),
          expr("(n_matched * 10000L) div n_total").as("match_bp"),
          expr("CASE WHEN n_matched = 0 THEN 0L " +
            "ELSE reward_cents div n_matched END").as("mean_reward_cents"))
    replay("logged", lit(true))
      .unionByName(replay("hash_by_user", col("arm_log") === col("arm_hash")))
      .unionByName(replay("fixed_arm0", col("arm_log") === 0))
  }

  /** Interval–interval overlap join, the bucketed form: user activity
    * spans joined to overlapping campaign windows. A naive theta-join
    * (`a.start <= b.end AND b.start <= a.end`) is a cartesian at scale;
    * the scale path FRAGMENTS each interval into the fixed-width
    * buckets it touches (weeks here) and equi-joins on the bucket index
    * — candidates are exactly the pairs sharing a bucket, a superset of
    * true overlaps pruned by the exact predicate, and the bucket
    * explosion is span/width-bounded per row (the standard interval-
    * join decomposition, e.g. the grid join in spatial engines).
    * Campaign windows are the deterministic 14-day-every-7 ladder off
    * the corpus origin. Emits exact overlap day counts.
    */
  def intervalOverlapJoin(events0: DataFrame, nCampaigns: Int = 12)
      : DataFrame = {
    val dayNs = 86400L * 1000000000L
    val spans = EventTime.toNanos(events0)
      .groupBy(col("user_id"))
      .agg(expr(s"min(ts div $dayNs)").as("u_start"),
        expr(s"max(ts div $dayNs)").as("u_end"))
    val origin = spans.agg(min(col("u_start")).as("g0"))
    val withBuckets = spans.crossJoin(broadcast(origin))
      .withColumn("rs", col("u_start") - col("g0"))
      .withColumn("re", col("u_end") - col("g0"))
    val spark = events0.sparkSession
    import spark.implicits._
    val campaigns = (0 until nCampaigns)
      .map(c => (c.toLong, 7L * c, 7L * c + 13L))
      .toDF("campaign_id", "c_start", "c_end")
    val frag = withBuckets
      .select(col("user_id"), col("rs"), col("re"),
        explode(sequence(expr("rs div 7"), expr("re div 7"))).as("wk"))
    val cFrag = campaigns
      .select(col("campaign_id"), col("c_start"), col("c_end"),
        explode(sequence(expr("c_start div 7"), expr("c_end div 7"))).as("wk"))
    frag.join(broadcast(cFrag), Seq("wk"))
      .filter(col("rs") <= col("c_end") && col("c_start") <= col("re"))
      .select(col("user_id"), col("campaign_id"),
        (least(col("re"), col("c_end")) -
          greatest(col("rs"), col("c_start")) + 1L).as("overlap_days"))
      .distinct()
  }

  /** Semi-structured schema discovery over a JSON payload column — the
    * profiling pass a pipeline runs before writing extraction code
    * against telemetry props: per JSON key, its row coverage, value
    * cardinality, and an inferred-type histogram (int / float / bool /
    * string by full-match classification of the extracted text). The
    * fixture's `props` is uniformly {"k": int}, so the key first
    * ENRICHES the payload deterministically from row fields (the
    * `text_pii_scrub` convention: synthesize the mess, then profile it
    * with the real machinery) — a third of rows gain a decimal "amt", a
    * third a "tag" string and a "flag" bool, keys now OPTIONAL so
    * coverage means something. The profile itself is one
    * keys-explode + one groupBy on the key name; output is bounded by
    * the key vocabulary, never the event count.
    */
  def propsSchemaProfile(events0: DataFrame): DataFrame = {
    val e = events0
      .withColumn("kstr", expr("get_json_object(props, '$.k')"))
      .withColumn("eprops", expr(
        "CASE CAST(event_id % 3 AS INT) " +
          "WHEN 0 THEN concat('{\"k\": ', kstr, ', \"amt\": \"', " +
          "CAST(CAST(value AS DECIMAL(18,2)) AS STRING), '\"}') " +
          "WHEN 1 THEN concat('{\"k\": ', kstr, ', \"tag\": \"t', " +
          "CAST(user_id % 5 AS STRING), '\", \"flag\": ', " +
          "IF(user_id % 2 = 0, 'true', 'false'), '}') " +
          "ELSE props END"))
      .select(col("eprops"))
    val total = e.agg(count(lit(1)).as("total"))
    e.select(col("eprops"),
        explode(expr("json_object_keys(eprops)")).as("key"))
      .withColumn("val", expr("get_json_object(eprops, concat('$.', key))"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_present"),
        countDistinct(col("val")).as("n_distinct"),
        sum(expr("IF(val rlike '^-?[0-9]+$', 1L, 0L)")).as("n_int"),
        sum(expr("IF(val rlike '^-?[0-9]+\\\\.[0-9]+$', 1L, 0L)")).as("n_float"),
        sum(expr("IF(val IN ('true', 'false'), 1L, 0L)")).as("n_bool"))
      .crossJoin(broadcast(total))
      .select(col("key"), col("n_present"),
        expr("(n_present * 10000L) div total").as("coverage_bp"),
        col("n_distinct"), col("n_int"), col("n_float"), col("n_bool"),
        (col("n_present") - col("n_int") - col("n_float") - col("n_bool"))
          .as("n_str"))
  }

  /** Nelson–Aalen cumulative-hazard estimate of user churn (Aalen 1978;
    * the log-space-exact counterpart of Kaplan–Meier — KM's survival
    * product is a float whose value depends on multiplication order,
    * while NA's hazard SUM of exact per-day rationals is
    * engine/partitioning-independent in fixed point; S(t) ≈ exp(−H(t))).
    * A user is AT RISK from their first to their last observed day;
    * churn happens on the last day unless it equals the corpus's final
    * day (right-censored — still absent tomorrow is not evidence of
    * churn when tomorrow isn't observed). n_risk needs no (user × day)
    * explosion: it is the running difference of the per-day start and
    * end counts — two user-sized aggregates plus cumulative sums over
    * the DENSE day grid (span-bounded, the one global window, same
    * class as the gap-fill keys). hazard_ppm = churn·10⁶ div risk;
    * cum_hazard_ppm is its running sum.
    */
  def survivalHazard(events0: DataFrame): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val spans = EventTime.toNanos(events0)
      .groupBy(col("user_id"))
      .agg(expr(s"min(ts div $dayNs)").as("first_day"),
        expr(s"max(ts div $dayNs)").as("last_day"))
    val bounds = spans.agg(min(col("first_day")).as("g0"),
      max(col("last_day")).as("gm"))
    val withCensor = spans.crossJoin(broadcast(bounds))
      .withColumn("churned", (col("last_day") < col("gm")).cast("long"))
    val starts = withCensor.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("n_start"))
    val ends = withCensor.groupBy(col("last_day").as("day"))
      .agg(count(lit(1)).as("n_end"), sum(col("churned")).as("n_churn"))
    val grid = bounds.select(explode(sequence(col("g0"), col("gm"))).as("day"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grid
      .join(starts, Seq("day"), "left")
      .join(ends, Seq("day"), "left")
      .na.fill(0L, Seq("n_start", "n_end", "n_churn"))
      .withColumn("n_risk",
        sum(col("n_start")).over(w) -
          coalesce(sum(col("n_end")).over(wPrev), lit(0L)))
      .withColumn("hazard_ppm", expr(
        "CASE WHEN n_risk = 0 THEN 0L ELSE (n_churn * 1000000L) div n_risk END"))
      .withColumn("cum_hazard_ppm", sum(col("hazard_ppm")).over(w))
      .select(col("day"), col("n_risk"), col("n_churn"),
        col("hazard_ppm"), col("cum_hazard_ppm"))
  }

  /** Theil–Sen daily-volume trend per event type — the robust slope
    * estimator (median of all pairwise slopes; Theil 1950, Sen 1968)
    * whose 29% breakdown point survives the spike days that drag an OLS
    * fit ([[graft.queries]]' `events_trend_slope`) arbitrarily far. Runs
    * on the DENSE per-type day grid (missing days are real zeros, the
    * [[dailyVolumeAnomalies]] convention). Each pairwise slope is the
    * TRUNCATING integer milli-slope (Δcount·1000) div Δdays — toward
    * zero for negatives in both Spark `div` and DuckDB `//` (the
    * measured house rule) — and the median ships doubled
    * (2×percentile(.5), integral at .5-interpolation). The pair relation
    * is span²-bounded per type — it scales with the CALENDAR, not the
    * event volume; the only corpus-sized work is the one daily
    * groupBy.
    */
  def theilSenDailyTrend(events0: DataFrame): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val e = EventTime.toNanos(events0)
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"))
    val cnt = e.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val rng = cnt.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val dense = rng
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("day"))
      .join(cnt, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
    dense.select(col("event_type"), col("day").as("da"), col("c").as("ca"))
      .join(dense.select(col("event_type"), col("day").as("db"),
        col("c").as("cb")), Seq("event_type"))
      .filter(col("da") < col("db"))
      .withColumn("slope_milli",
        expr("((cb - ca) * 1000L) div (db - da)"))
      .groupBy(col("event_type"))
      .agg(
        (max(col("db")) - min(col("da")) + 1L).as("n_days"),
        count(lit(1)).as("n_pairs"),
        expr("CAST(round(2 * percentile(slope_milli, 0.5), 0) AS BIGINT)")
          .as("slope2_milli"))
  }

  /** Mann–Kendall trend test per event type over the dense daily count
    * grid — the significance companion to [[theilSenDailyTrend]] (Theil-
    * Sen estimates the slope, MK decides whether a monotone trend exists
    * at all). S = Σ_{i<j} sign(c_j − c_i) over day pairs; the pair
    * relation is the same span²-bounded self-join as Theil-Sen — it
    * scales with the CALENDAR, not the event volume. Tie-corrected
    * variance ships as the exact integer image var18 = Var(S)·18 =
    * n(n−1)(2n+5) − Σ t(t−1)(2t+5) (ties grouped by repeated daily
    * count), and the continuity-corrected z² as z2_milli =
    * 18000·(|S|−1)² div var18 (0 when S = 0) — all BIGINT-safe at any
    * sf because every term is day-grid-bounded.
    *
    * The zero-filled (type, day) relation feeds three consumers (both
    * sides of the pair self-join and the tie aggregate). RepeatAudit
    * flags the shared chain, but cutting it was MEASURED 3× SLOWER at
    * sf1 (warm 0.67 → 2.10 s, tasks 37 → 73: AQE's exchange reuse
    * already shares the identical groupBy exchange across the three
    * consumers, and a localCheckpoint adds the write plus loses scan
    * pruning — the er_blocking_eval lesson). `materialize` therefore
    * defaults to [[graft.engine.Materialize.none]]; pass
    * [[graft.engine.Materialize.parquet]] only on a cluster where a
    * lost executor must not recompute the events scan.
    */
  def mannKendallDailyTrend(events0: DataFrame,
      materialize: DataFrame => DataFrame =
        graft.engine.Materialize.none): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val e = EventTime.toNanos(events0)
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"))
    val cnt = e.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val rng = cnt.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val dense = materialize(rng
      .select(col("event_type"), explode(sequence(col("mn"), col("mx"))).as("day"))
      .join(cnt, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c")))
    val s = dense.select(col("event_type"), col("day").as("da"), col("c").as("ca"))
      .join(dense.select(col("event_type"), col("day").as("db"),
        col("c").as("cb")), Seq("event_type"))
      .filter(col("da") < col("db"))
      .groupBy(col("event_type"))
      .agg(sum(expr("CASE WHEN cb > ca THEN 1L WHEN cb < ca THEN -1L " +
        "ELSE 0L END")).as("s_stat"),
        (max(col("db")) - min(col("da")) + 1L).as("n_days"))
    val ties = dense.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
    s.join(ties, Seq("event_type"))
      .withColumn("var18", expr(
        "n_days * (n_days - 1) * (2 * n_days + 5) - tie_term"))
      .select(col("event_type"), col("n_days"), col("s_stat"),
        col("tie_term"), col("var18"),
        expr("CASE WHEN s_stat = 0 THEN 0L ELSE " +
          "(18000 * (abs(s_stat) - 1) * (abs(s_stat) - 1)) div var18 END")
          .as("z2_milli"))
  }

  /** Pettitt changepoint test per event type over the dense daily count
    * grid — the rank-based "WHEN did the level shift?" companion to
    * [[mannKendallDailyTrend]]'s "is there a trend?". The textbook
    * U_t = Σ_{i≤t}Σ_{j>t} sign(cᵢ−cⱼ) collapses to a single window:
    * with r2 the doubled tie-averaged rank of day t's count within its
    * type, V_t = #(c < c_t) − #(c > c_t) = r2_t − 1 − n, and U_t is the
    * running sum of V in day order (U_n telescopes to 0 — asserted by
    * construction). K = max|U_t| over t < last day; t_hat is the
    * EARLIEST day attaining K. Significance ships log-free: the
    * approximate p = 2·exp(−6K²/(n³+n²)) is monotone in its exponent,
    * so `exp6k2_milli` = (6000·K²) div (n³+n²) is its exact integer
    * image and p ≤ 0.05 ⟺ exponent ≥ ln 40 — the frozen milli-ceiled
    * literal 3689 (a statistic in the sub-milli band [3.68888, 3.689)
    * reads non-reject; the [[DataQuality.mannWhitneyU]] convention).
    * Every relation — grid, per-count tie groups, both windows — is
    * CALENDAR-bounded and partitioned by event type.
    */
  def pettittChangepoint(events0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000000000L
    val e = EventTime.toNanos(events0)
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"))
    val cnt = e.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val rng = cnt.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val dense = rng
      .select(col("event_type"), col("mx"),
        explode(sequence(col("mn"), col("mx"))).as("day"))
      .join(cnt, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
    val byC = dense.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("t"))
    val wr = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r2 = byC.withColumn("cumt", sum(col("t")).over(wr))
      .select(col("event_type"), col("c"),
        expr("2 * (cumt - t) + t + 1").as("r2"))
    val wu = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val u = dense.join(r2, Seq("event_type", "c"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("u_t", sum(expr("r2 - 1 - n")).over(wu))
      .filter(col("day") < col("mx"))
    u.groupBy(col("event_type"))
      .agg(max(expr("abs(u_t)")).as("k_stat"),
        max(col("n")).as("n_days"))
      .join(u.select(col("event_type"), col("day"),
        expr("abs(u_t)").as("absu")),
        Seq("event_type"))
      .filter(col("absu") === col("k_stat"))
      .groupBy(col("event_type"), col("n_days"), col("k_stat"))
      .agg(min(col("day")).as("t_hat_day"))
      .select(col("event_type"), col("n_days"), col("k_stat"),
        col("t_hat_day"),
        expr("(6000 * k_stat * k_stat) div " +
          "(n_days * n_days * n_days + n_days * n_days)")
          .as("exp6k2_milli"))
      .withColumn("reject_95", expr("CAST(exp6k2_milli >= 3689 AS INT)"))
  }

  /** McNemar paired-proportion test on conversion: did the share of
    * users converting (emitting `convType`) CHANGE between the first
    * and second half of the observed range, pairing each user with
    * itself? The midpoint is a one-row broadcast aggregate (the
    * [[heavyChangers]] pattern); each user seen in ANY event collapses
    * to its (early, late) conversion pair in one user-keyed aggregate,
    * and the 2×2 discordant cells drive the continuity-corrected
    * χ²₁ = (|b−c|−1)²/(b+c), shipped exact as
    * chi2_cc_milli = 1000·(|b−c|−1)² div (b+c) (0 when b = c — the
    * correction cannot push a χ² below zero — and guarded when
    * b + c = 0); verdict at the frozen milli-ceiled χ²₁ critical 3842.
    * One corpus scan, one user-keyed shuffle, O(1) output.
    */
  def mcnemarConversion(events0: DataFrame,
      convType: String = "purchase"): DataFrame = {
    val e = EventTime.toNanos(events0)
      .select(col("user_id"), col("event_type"), col("ts"))
    val mid = e.agg(expr("(min(ts) + max(ts)) div 2").as("mid_ns"))
    e.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        max(when(col("event_type") === convType &&
          col("ts") < col("mid_ns"), 1L).otherwise(0L)).as("early"),
        max(when(col("event_type") === convType &&
          col("ts") >= col("mid_ns"), 1L).otherwise(0L)).as("late"))
      .agg(count(lit(1)).as("n_users"),
        sum(expr("CAST(early = 1 AND late = 1 AS BIGINT)")).as("a_both"),
        sum(expr("CAST(early = 1 AND late = 0 AS BIGINT)")).as("b_early_only"),
        sum(expr("CAST(early = 0 AND late = 1 AS BIGINT)")).as("c_late_only"),
        sum(expr("CAST(early = 0 AND late = 0 AS BIGINT)")).as("d_neither"))
      .withColumn("chi2_cc_milli", expr(
        "CASE WHEN b_early_only = c_late_only THEN 0L ELSE " +
          "(1000 * (abs(b_early_only - c_late_only) - 1) * " +
          "(abs(b_early_only - c_late_only) - 1)) div " +
          "(b_early_only + c_late_only) END"))
      .withColumn("reject_95", expr("CAST(chi2_cc_milli >= 3842 AS INT)"))
  }

  /** Attribute control chart (p-chart) on the daily error share — the
    * SPC companion to the CUSUM/EWMA keys: with the whole-span error
    * rate p = E/N as the centre line, a day is OUT OF CONTROL when its
    * share leaves the 3σ binomial band, decided with NO square root via
    * the cross-multiplied form (eᵢN − Enᵢ)² > 9·E·(N−E)·nᵢ — exact
    * integers end to end (DECIMAL for the square, ~5·10¹⁹ at sf1). One
    * day-keyed aggregate plus a broadcast one-row total.
    */
  def errorPChart(events0: DataFrame,
      errorType: String = "error"): DataFrame = {
    val d = "DECIMAL(38,0)"
    val dayNs = 86400L * 1000000000L
    val daily = EventTime.toNanos(events0)
      .groupBy(expr(s"ts div $dayNs").as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === errorType, 1L).otherwise(0L))
          .as("e"))
    val tot = daily.agg(sum(col("n")).as("nn"), sum(col("e")).as("ee"))
    daily.crossJoin(broadcast(tot))
      .select(col("day"), col("n").as("n_events"),
        col("e").as("n_errors"),
        expr("(10000 * e) div n").as("share_bp"),
        expr(s"CAST((CAST(e AS $d) * nn - CAST(ee AS $d) * n) * " +
          s"(CAST(e AS $d) * nn - CAST(ee AS $d) * n) > " +
          s"9 * CAST(ee AS $d) * (nn - ee) * n AS INT)").as("oob_3sigma"))
  }

  /** Time-to-convert profile — the activation question "how long from a
    * user's first touch to their first purchase?": per user the minute
    * lag between first event and first purchase, then the conversion
    * share and lag quartiles (type-1 order statistics over the
    * CALENDAR-bounded lag-minute value domain). Non-converters count in
    * the denominator (conv_bp) and are excluded from the lag quantiles —
    * the right-censoring treatment stated; the survival-hazard key is
    * the censoring-aware companion.
    */
  def timeToConvert(events0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val minNs = 60L * 1000000000L
    val users = EventTime.toNanos(events0)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("t0"),
        min(when(col("event_type") === "purchase", col("ts"))).as("tc"))
    val lags = users.filter(col("tc").isNotNull)
      .select(expr(s"(tc - t0) div $minNs").as("lag_min"))
      .groupBy(col("lag_min")).agg(count(lit(1)).as("t"))
    val w = Window.orderBy(col("lag_min"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val q = lags
      .withColumn("cum", sum(col("t")).over(w))
      .withColumn("nc", sum(col("t")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .agg(max(col("nc")).as("n_converted"),
        min(when(expr("cum >= (nc + 3) div 4"), col("lag_min"))).as("q1_min"),
        min(when(expr("cum >= (nc + 1) div 2"), col("lag_min"))).as("med_min"),
        min(when(expr("cum >= (3 * nc + 3) div 4"), col("lag_min")))
          .as("q3_min"))
    users.agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(q))
      .select(col("n_users"), col("n_converted"),
        expr("(10000 * n_converted) div n_users").as("conv_bp"),
        col("q1_min"), col("med_min"), col("q3_min"))
  }

  /** Hodges–Lehmann location estimate of daily revenue per event type —
    * the rank-based robust "typical day" (the estimator dual to the
    * Wilcoxon test): the median of all Walsh averages (cᵢ+cⱼ)/2, i ≤ j,
    * over the day grid. The pair relation is CALENDAR²-bounded (the
    * Theil–Sen shape); sums ship doubled and the median of the pair
    * sums uses the shared doubled-median convention, so the output
    * hl_quarter = lo + hi order statistics of (cᵢ+cⱼ) is the exact 4×HL
    * image — hl_milli = 250·hl_quarter is exact milli-cents.
    */
  def hodgesLehmannDaily(events0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dayNs = 86400L * 1000000000L
    val daily = EventTime.toNanos(events0)
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(expr("CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 " +
        "AS BIGINT)) AS BIGINT)").as("c"))
    val rng = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val dense = rng
      .select(col("event_type"), explode(sequence(col("mn"), col("mx")))
        .as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
    val pairs = dense.select(col("event_type"), col("day").as("da"),
      col("c").as("ca"))
      .join(dense.select(col("event_type"), col("day").as("db"),
        col("c").as("cb")), Seq("event_type"))
      .filter(col("da") <= col("db"))
      .groupBy(col("event_type"), (col("ca") + col("cb")).as("ws"))
      .agg(count(lit(1)).as("t"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ws"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pairs
      .withColumn("cum", sum(col("t")).over(w))
      .withColumn("np", sum(col("t")).over(
        Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"), col("np"))
      .agg((min(when(expr("cum >= (np + 1) div 2"), col("ws"))) +
        min(when(expr("cum >= np div 2 + 1"), col("ws"))))
        .as("hl_quarter"))
      .select(col("event_type"), col("np").as("n_pairs"),
        expr("250 * hl_quarter").as("hl_milli_cents"))
  }

  /** Watermark-lateness audit — for candidate watermark delays, how many
    * events would a streaming deployment DROP because they arrive after
    * the watermark already passed their event time? Arrival order is the
    * event_id (the fixture's ingestion proxy, stated); an event is late
    * for delay W when max(ts of strictly earlier arrivals) − ts > W.
    * The running maximum is computed SCALE-SAFE as a three-level
    * distributed prefix scan — within 4096-id buckets (partitioned
    * windows), bucket carries within 4096-bucket superbuckets, and a
    * top grid of n/2²⁴ rows (≈ 60 k at 10¹² events) — never a
    * data-sized unpartitioned window; the DuckDB oracle states the SAME
    * quantity as one global window, which is exactly the single-node
    * shortcut the distributed form replaces. One row out with per-delay
    * late counts and shares.
    */
  def watermarkLateness(events0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = 4096L
    val e = EventTime.toNanos(events0).select(col("event_id"), col("ts"))
      .withColumn("bk", expr(s"event_id div $b"))
      .withColumn("sb", expr(s"event_id div ${b * b}"))
    val wB = Window.partitionBy(col("bk")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bmax = e.groupBy(col("sb"), col("bk")).agg(max(col("ts")).as("bm"))
    val wSb = Window.partitionBy(col("sb")).orderBy(col("bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry1 = bmax.withColumn("c1", max(col("bm")).over(wSb))
      .select(col("bk"), col("c1"))
    val sbmax = bmax.groupBy(col("sb")).agg(max(col("bm")).as("sm"))
    val wTop = Window.orderBy(col("sb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry2 = sbmax.withColumn("c2", max(col("sm")).over(wTop))
      .select(col("sb"), col("c2"))
    val hourNs = 3600L * 1000000000L
    e.withColumn("p0", max(col("ts")).over(wB))
      .join(carry1, Seq("bk"))
      .join(broadcast(carry2), Seq("sb"))
      .withColumn("wm", greatest(
        coalesce(col("p0"), lit(Long.MinValue)),
        coalesce(col("c1"), lit(Long.MinValue)),
        coalesce(col("c2"), lit(Long.MinValue))))
      // additive compare (wm > ts + W): the MinValue no-earlier-arrival
      // sentinel reads "not late" without the subtraction overflowing
      .agg(count(lit(1)).as("n_events"),
        sum(expr(s"CAST(wm > ts + ${1L * hourNs} AS BIGINT)")).as("late_1h"),
        sum(expr(s"CAST(wm > ts + ${6L * hourNs} AS BIGINT)")).as("late_6h"),
        sum(expr(s"CAST(wm > ts + ${24L * hourNs} AS BIGINT)"))
          .as("late_24h"))
      .select(col("n_events"), col("late_1h"), col("late_6h"),
        col("late_24h"),
        expr("(10000 * late_1h) div n_events").as("late_1h_bp"),
        expr("(10000 * late_24h) div n_events").as("late_24h_bp"))
  }

  /** Concurrent-session load profile — the capacity-planning view: gap
    * sessionization (30-min inactivity, the [[sessions]] convention,
    * deterministic (ts, event_id) order), each session occupies its
    * half-open MINUTE span, and a sweep-line over the dense minute grid
    * (+1 at start, −1 at end, one running sum — CALENDAR-bounded)
    * yields concurrency per minute. Emits per day: peak concurrent
    * sessions and the time-average in exact milli
    * ((1000·Σ minute-concurrency) div minutes-in-day).
    */
  def sessionConcurrency(events0: DataFrame,
      gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val minNs = 60L * 1000000000L
    val gapNs = gapMinutes * minNs
    val e = EventTime.toNanos(events0)
      .select(col("user_id"), col("ts"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = e
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("brk", expr(
        s"CASE WHEN prev IS NULL OR ts - prev > $gapNs THEN 1L " +
          "ELSE 0L END"))
      .withColumn("sid", sum(col("brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(expr(s"min(ts) div $minNs").as("sm"),
        expr(s"max(ts) div $minNs + 1").as("em"))
    val deltas = sess
      .select(explode(array(
        struct(col("sm").as("minute"), lit(1L).as("d")),
        struct(col("em").as("minute"), lit(-1L).as("d")))).as("x"))
      .select(col("x.minute"), col("x.d"))
      .groupBy(col("minute")).agg(sum(col("d")).as("delta"))
    val rng = deltas.agg(min(col("minute")).as("mn"),
      max(col("minute")).as("mx"))
    val wG = Window.orderBy(col("minute"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rng
      .select(explode(sequence(col("mn"), col("mx"))).as("minute"))
      .join(deltas, Seq("minute"), "left")
      .na.fill(0L, Seq("delta"))
      .withColumn("conc", sum(col("delta")).over(wG))
      .groupBy(expr("minute div 1440").as("day"))
      .agg(max(col("conc")).as("peak_concurrent"),
        count(lit(1)).as("n_minutes"),
        sum(col("conc")).as("conc_sum"))
      .select(col("day"), col("peak_concurrent"),
        expr("(1000 * conc_sum) div n_minutes").as("avg_concurrent_milli"))
  }

  /** Wald–Wolfowitz runs test per event type — is the daily revenue
    * series RANDOM around its median, or does it trend/cluster (too few
    * runs) or oscillate (too many)? Days at the exact median are
    * excluded (the standard treatment); signs come from the doubled
    * median (2c vs m2, integral under even counts), runs from one lag
    * over the day order, and the normal approximation ships exact:
    * z² = (Rn − 2n₁n₂ − n)²·(n−1) / (2n₁n₂·(2n₁n₂ − n)) in milli with
    * the frozen 3842 verdict. Every relation — grid, value-domain
    * median window, sign lag — is CALENDAR-bounded per type.
    *
    * EAGER at construction: the per-type median relation (k rows after
    * the grid + value-window chain) is cut once — measured 2.0× warm at
    * sf1 (3.39 → 1.71 s) vs lazy (the dunnPosthoc pattern).
    */
  def runsTest(events0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = "DECIMAL(38,0)"
    val dayNs = 86400L * 1000000000L
    val daily = EventTime.toNanos(events0)
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(expr("CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 " +
        "AS BIGINT)) AS BIGINT)").as("c"))
    val rng = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val dense = rng
      .select(col("event_type"), explode(sequence(col("mn"), col("mx")))
        .as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
    val wc = Window.partitionBy(col("event_type")).orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = graft.engine.Materialize.local(
      dense.groupBy(col("event_type"), col("c"))
        .agg(count(lit(1)).as("t"))
        .withColumn("cum", sum(col("t")).over(wc))
        .withColumn("ni", sum(col("t")).over(
          Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg((min(when(expr("cum >= (ni + 1) div 2"), col("c"))) +
          min(when(expr("cum >= ni div 2 + 1"), col("c")))).as("m2")))
    val signed = dense.join(broadcast(med), Seq("event_type"))
      .filter(expr("2 * c != m2"))
      .withColumn("s", expr("CASE WHEN 2 * c > m2 THEN 1 ELSE -1 END"))
    signed
      .withColumn("brk", expr(
        "CASE WHEN lag(s, 1) OVER (PARTITION BY event_type ORDER BY day) " +
          "IS NULL OR lag(s, 1) OVER (PARTITION BY event_type " +
          "ORDER BY day) != s THEN 1L ELSE 0L END"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(s = 1 AS BIGINT)")).as("n_above"),
        sum(expr("CAST(s = -1 AS BIGINT)")).as("n_below"),
        sum(col("brk")).as("r_runs"))
      .withColumn("num", expr(
        s"CAST(r_runs * n - 2 * n_above * n_below - n AS $d)"))
      .withColumn("den", expr(
        s"2 * CAST(n_above AS $d) * n_below * " +
          "(2 * CAST(n_above AS DECIMAL(38,0)) * n_below - n)"))
      .select(col("event_type"), col("n").as("n_scored"),
        col("n_above"), col("n_below"), col("r_runs"),
        expr("CAST((1000 * num * num * (n - 1)) div " +
          "(CASE WHEN den <= 0 THEN 1 ELSE den END) AS BIGINT)")
          .as("z2_milli"))
      .withColumn("reject_95", expr("CAST(z2_milli >= 3842 AS INT)"))
  }

  /** Durbin–Watson statistic per event type over the dense daily
    * revenue grid — first-order serial correlation of the residuals
    * from the series mean (DW ≈ 2 means none, → 0 positive, → 4
    * negative autocorrelation). With the exact scaled residual
    * e′_t = n·c_t − S (no division), successive differences collapse to
    * e′_t − e′_{t−1} = n·(c_t − c_{t−1}), so
    * DW = n²·Σ(Δc)² / Σ(n·c_t − S)² ships as one DECIMAL(38,0)
    * cross-multiplied milli quotient. CALENDAR-bounded throughout; a
    * constant series zeroes the denominator (guarded, reads 0).
    */
  def durbinWatson(events0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = "DECIMAL(38,0)"
    val dayNs = 86400L * 1000000000L
    val daily = EventTime.toNanos(events0)
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(expr("CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 " +
        "AS BIGINT)) AS BIGINT)").as("c"))
    val rng = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val dense = rng
      .select(col("event_type"), explode(sequence(col("mn"), col("mx")))
        .as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    dense
      .withColumn("dc", col("c") - lag(col("c"), 1).over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).cast(d).as("s"),
        sum(expr(s"CAST(c AS $d) * c")).as("q"),
        sum(expr(s"CAST(dc AS $d) * dc")).as("sq_diff"))
      // Σ(n·c − S)² = n²·Σc² − n·S² = n·(n·Σc² − S²)
      .withColumn("den", expr("CAST(n AS DECIMAL(38,0)) * " +
        "(n * q - s * s)"))
      .select(col("event_type"), col("n").as("n_days"),
        expr(s"CAST((1000 * CAST(n AS $d) * n * sq_diff) div " +
          "(CASE WHEN den = 0 THEN 1 ELSE den END) AS BIGINT)")
          .as("dw_milli"))
  }

  /** Theil's U relative-accuracy metrics for the seasonal-naive
    * forecast per event type — the scale-free companions to
    * [[seasonalNaiveBacktest]]'s MAE/MAPE: over the SAME evaluation
    * rows (days with a lag-`season` forecast), relative MAE vs the
    * naive-1 forecast (Theil's U₁ flavour, = MASE restricted to the
    * shared span) and the squared-error ratio U² (Theil 1966). Both
    * ship as exact milli cross-ratios of DECIMAL error sums — below
    * 1000 means the seasonal model beats last-value persistence.
    * CALENDAR-bounded lag windows; degenerate zero-denominator series
    * guarded to 1.
    */
  def forecastTheilU(events0: DataFrame, season: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = "DECIMAL(38,0)"
    val dayNs = 86400L * 1000000000L
    val daily = EventTime.toNanos(events0)
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(expr("CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 " +
        "AS BIGINT)) AS BIGINT)").as("c"))
    val rng = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val dense = rng
      .select(col("event_type"), explode(sequence(col("mn"), col("mx")))
        .as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    dense
      .withColumn("f", lag(col("c"), season).over(w))
      .withColumn("p", lag(col("c"), 1).over(w))
      .filter(col("f").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(expr("abs(c - f)")).cast(d).as("ae_f"),
        sum(expr("abs(c - p)")).cast(d).as("ae_1"),
        sum(expr(s"CAST(c - f AS $d) * (c - f)")).as("sq_f"),
        sum(expr(s"CAST(c - p AS $d) * (c - p)")).as("sq_1"))
      .select(col("event_type"), col("n_eval"),
        col("ae_f").cast("long").as("ae_seasonal_cents"),
        col("ae_1").cast("long").as("ae_naive1_cents"),
        expr("CAST((1000 * ae_f) div (CASE WHEN ae_1 = 0 THEN 1 " +
          "ELSE ae_1 END) AS BIGINT)").as("rel_mae_milli"),
        expr("CAST((1000 * sq_f) div (CASE WHEN sq_1 = 0 THEN 1 " +
          "ELSE sq_1 END) AS BIGINT)").as("u2_milli"))
  }

  /** Forecast tracking signal per event type — the classic bias monitor
    * (Trigg 1964 flavour, cumulative form): TS = Σe / MAD where
    * e = actual − lag-7 seasonal-naive forecast over the dense daily
    * grid; |TS| ≥ 4 is the textbook "forecast is biased, re-fit" alarm.
    * With MAD = Σ|e|/n the ratio collapses to the exact cross form
    * ts_milli = (1000·n·Σe) div Σ|e| (sign preserved, divisor guarded),
    * and the alarm is the frozen 4000-milli threshold on |ts|.
    * CALENDAR-bounded lag window per type.
    */
  def trackingSignal(events0: DataFrame, season: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = "DECIMAL(38,0)"
    val dayNs = 86400L * 1000000000L
    val daily = EventTime.toNanos(events0)
      .groupBy(col("event_type"), expr(s"ts div $dayNs").as("day"))
      .agg(expr("CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 " +
        "AS BIGINT)) AS BIGINT)").as("c"))
    val rng = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    rng
      .select(col("event_type"), explode(sequence(col("mn"), col("mx")))
        .as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .na.fill(0L, Seq("c"))
      .withColumn("f", lag(col("c"), season).over(w))
      .filter(col("f").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"),
        sum(expr("c - f")).cast(d).as("se"),
        sum(expr("abs(c - f)")).cast(d).as("sae"))
      .select(col("event_type"), col("n_eval"),
        col("se").cast("long").as("sum_err_cents"),
        col("sae").cast("long").as("sum_abs_err_cents"),
        expr("CAST((1000 * CAST(n_eval AS DECIMAL(38,0)) * se) div " +
          "(CASE WHEN sae = 0 THEN 1 ELSE sae END) AS BIGINT)")
          .as("ts_milli"))
      .withColumn("bias_alarm", expr("CAST(abs(ts_milli) >= 4000 AS INT)"))
  }

  /** Qini curve at score deciles — the standard uplift-model EVAL
    * (Radcliffe 2007): rank users by a targeting score (here pre-period
    * activity), walk down from the most-targeted, and at each decile
    * compare cumulative treated conversions against the
    * control-rate-scaled expectation:
    * Q(φ) = conv_t(φ) − conv_c(φ)·n_t(φ)/n_c(φ), in exact milli. Arms
    * are the md5 user buckets ([[cupedAdjustment]]), conversion is a
    * post-midpoint purchase, and deciles are VALUE-GROUPED — each score
    * tie group sits wholly in the decile of its first member
    * ((10·C_before) div n + 1), so the assignment reduces over the
    * score DOMAIN (small integers), never per-user rank. The curve is
    * a 10-row cumulative window.
    */
  def qiniDeciles(events0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = "DECIMAL(38,0)"
    val e = EventTime.toNanos(events0)
    val mid = e.agg(expr("(min(ts) + max(ts)) div 2").as("mid_ns"))
    val units = e.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(sum(when(col("ts") < col("mid_ns"), 1L).otherwise(0L))
        .as("score"),
        max(when(col("event_type") === "purchase" &&
          col("ts") >= col("mid_ns"), 1L).otherwise(0L)).as("conv"))
      .withColumn("arm", expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) " +
          "AS BIGINT) % 2"))
    // byScore is consumed twice (global total + the decile walk) but
    // stays LAZY: a localCheckpoint cut measured neutral at sf1
    // (1.63 vs 1.59 s warm) — AQE reuses the user-aggregate exchange
    val byScore = units.groupBy(col("score"))
      .agg(count(lit(1)).as("t"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("ct"),
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("cc"))
    val glob = byScore.agg(sum(col("t")).as("n"))
    val wD = Window.orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wB = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byScore
      .withColumn("cum_before", sum(col("t")).over(wD) - col("t"))
      .crossJoin(broadcast(glob))
      .withColumn("bucket", expr("(10 * cum_before) div n + 1"))
      .groupBy(col("bucket"))
      .agg(sum(col("nt")).as("bnt"), sum(col("ct")).as("bct"),
        sum(col("nc")).as("bnc"), sum(col("cc")).as("bcc"))
      .withColumn("cum_n_treat", sum(col("bnt")).over(wB))
      .withColumn("cum_conv_treat", sum(col("bct")).over(wB))
      .withColumn("cum_n_ctrl", sum(col("bnc")).over(wB))
      .withColumn("cum_conv_ctrl", sum(col("bcc")).over(wB))
      .select(col("bucket"), col("cum_n_treat"), col("cum_n_ctrl"),
        col("cum_conv_treat"), col("cum_conv_ctrl"),
        expr(s"CAST(1000 * cum_conv_treat - (1000 * CAST(cum_conv_ctrl " +
          s"AS $d) * cum_n_treat) div (CASE WHEN cum_n_ctrl = 0 THEN 1 " +
          "ELSE cum_n_ctrl END) AS BIGINT)").as("qini_milli"))
  }

  /** Next-event diversity per antecedent type — how PREDICTABLE is what
    * follows each event type? The log-free cousin of transition entropy:
    * over the same (prev, next) bigram relation [[markovNextEval]] fits
    * its model on, each antecedent's successor distribution ships its
    * Gini–Simpson index in exact ppm and its inverse-Simpson effective
    * successor count in milli (Hill number of order 2 — eff ≈ 1 means
    * the next event is near-deterministic, eff ≈ k means anything can
    * follow). One user-keyed lead window (the shared funnel/session
    * shape), then a |types|²-bounded reduction.
    */
  def transitionDiversity(events0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = "DECIMAL(38,0)"
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    EventTime.toNanos(events0)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("prev_type"))
      .agg(count(lit(1)).as("n_next_types"),
        sum(col("c")).cast(d).as("n"),
        sum(expr(s"CAST(c AS $d) * c")).as("sq"))
      .select(col("prev_type"),
        col("n").cast("long").as("n_transitions"), col("n_next_types"),
        expr("CAST(1000000 - (1000000 * sq) div (n * n) AS BIGINT)")
          .as("gini_simpson_ppm"),
        expr("CAST((1000 * n * n) div sq AS BIGINT)").as("eff_next_milli"))
  }

  /** Cochran's Q test — do the k event types differ in REACH (share of
    * users emitting them), treating each user as its own block? The
    * k-treatment generalisation of [[mcnemarConversion]] (Cochran
    * 1950): with column totals Cⱼ (users reaching type j), row totals
    * Rᵢ (types user i reached) and S = ΣCⱼ = ΣRᵢ,
    * Q = (k−1)·(k·ΣCⱼ² − S²) / (k·S − ΣRᵢ²), χ²(k−1) under H0; blocks
    * with constant response cancel by construction. Ships exact as
    * q_milli with the same frozen χ² criticals as [[DataQuality
    * .kruskalWallisH]]. One distinct (user, type) reduction; both
    * marginals reduce from it — nothing data-sized is ever paired.
    */
  def cochranQ(events0: DataFrame): DataFrame = {
    val d = "DECIMAL(38,0)"
    val pairs = EventTime.toNanos(events0)
      .select(col("user_id"), col("event_type")).distinct()
    val rows = pairs.groupBy(col("user_id")).agg(count(lit(1)).as("r"))
      .agg(count(lit(1)).as("n_users"), sum(col("r")).cast(d).as("s"),
        sum(expr(s"CAST(r AS $d) * r")).as("sr2"))
    val cols = pairs.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).cast(d).as("k"),
        sum(expr(s"CAST(c AS $d) * c")).as("sc2"))
    rows.crossJoin(broadcast(cols))
      .withColumn("q_milli", expr(
        "(1000 * (k - 1) * (k * sc2 - s * s)) div " +
          "(CASE WHEN k * s - sr2 = 0 THEN 1 ELSE k * s - sr2 END)"))
      .withColumn("crit_milli", expr(
        "CASE k - 1 WHEN 1 THEN 3842 WHEN 2 THEN 5992 WHEN 3 THEN 7815 " +
          "WHEN 4 THEN 9488 WHEN 5 THEN 11071 WHEN 6 THEN 12592 " +
          "WHEN 7 THEN 14068 WHEN 8 THEN 15508 WHEN 9 THEN 16919 " +
          "WHEN 10 THEN 18308 ELSE NULL END"))
      .select(col("k").cast("long").as("k_types"),
        col("n_users").cast("long").as("n_users"),
        col("s").cast("long").as("s_total"),
        col("q_milli").cast("long").as("q_milli"),
        expr("CAST(k - 1 AS BIGINT)").as("df"),
        expr("CAST(q_milli >= crit_milli AS INT)").as("reject_95"))
  }

  /** Difference-in-differences estimate of the treatment effect on
    * per-user purchase revenue: arms are the deterministic md5 user
    * buckets (the [[cupedAdjustment]] assignment), periods split at the
    * broadcast range midpoint (the [[heavyChangers]] pattern), and the
    * estimator is the classic
    * DiD = (ȳ₁,post − ȳ₁,pre) − (ȳ₀,post − ȳ₀,pre) over the FULL user
    * universe (non-purchasers contribute zero cents — dropping them
    * would bias the parallel-trends baseline). Cell means ship in exact
    * MILLI-cents ((1000·Σcents) div n_arm) and the headline effect as
    * one cross-multiplied integer division:
    * did_milli = 1000·((Σpost₁−Σpre₁)·n₀ − (Σpost₀−Σpre₀)·n₁) div n₁n₀.
    * One user-keyed aggregate; everything after is arm-sized.
    */
  def diffInDiff(events0: DataFrame): DataFrame = {
    val d = "DECIMAL(38,0)"
    val e = EventTime.toNanos(events0)
    val mid = e.agg(expr("(min(ts) + max(ts)) div 2").as("mid_ns"))
    val units = e.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        expr("CAST(sum(CASE WHEN event_type = 'purchase' AND ts < mid_ns " +
          "THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) " +
          s"ELSE 0 END) AS $d)").as("pre"),
        expr("CAST(sum(CASE WHEN event_type = 'purchase' AND ts >= mid_ns " +
          "THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) " +
          s"ELSE 0 END) AS $d)").as("post"))
      .withColumn("arm", expr(
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 8), 16, 10) " +
          "AS BIGINT) % 2"))
    units
      .agg(
        sum(expr("CAST(arm = 0 AS BIGINT)")).cast(d).as("n0"),
        sum(expr("CAST(arm = 1 AS BIGINT)")).cast(d).as("n1"),
        sum(expr("CASE WHEN arm = 0 THEN pre ELSE 0 END")).as("pre0"),
        sum(expr("CASE WHEN arm = 0 THEN post ELSE 0 END")).as("post0"),
        sum(expr("CASE WHEN arm = 1 THEN pre ELSE 0 END")).as("pre1"),
        sum(expr("CASE WHEN arm = 1 THEN post ELSE 0 END")).as("post1"))
      .select(
        col("n0").cast("long").as("n_control"),
        col("n1").cast("long").as("n_treat"),
        expr("CAST((1000 * pre0) div (CASE WHEN n0 = 0 THEN 1 ELSE n0 END) " +
          "AS BIGINT)").as("pre_control_milli"),
        expr("CAST((1000 * post0) div (CASE WHEN n0 = 0 THEN 1 ELSE n0 END) " +
          "AS BIGINT)").as("post_control_milli"),
        expr("CAST((1000 * pre1) div (CASE WHEN n1 = 0 THEN 1 ELSE n1 END) " +
          "AS BIGINT)").as("pre_treat_milli"),
        expr("CAST((1000 * post1) div (CASE WHEN n1 = 0 THEN 1 ELSE n1 END) " +
          "AS BIGINT)").as("post_treat_milli"),
        expr("CAST((1000 * ((post1 - pre1) * n0 - (post0 - pre0) * n1)) div " +
          "(CASE WHEN n1 * n0 = 0 THEN 1 ELSE n1 * n0 END) AS BIGINT)")
          .as("did_milli"))
  }

  /** Paired sign-flip permutation test on daily revenue difference
    * between two event types — the resampling-inference companion to
    * [[bootstrapDailyMeanCI]] (bootstrap asks "how wide?", the
    * permutation test asks "could the observed difference be label
    * noise?"). Under H0 the per-day (A, B) cent totals are
    * exchangeable, so each replica flips the sign of each day's
    * difference on a DETERMINISTIC md5 coin — u = first 6 md5 hex
    * digits of "perm-b:day", flip when u < 2²³ (16⁶/2) — identical in
    * any engine or partitioning (the [[bootstrapDailyMeanCI]] draw
    * discipline). The statistic is |Σ diff| and the add-one p-value
    * ships exact: p_milli = 1000·(1 + #{|S_b| ≥ |S_obs|}) div (B + 1)
    * (Phipson & Smyth 2010 — never exactly zero). The day relation is
    * CALENDAR-bounded; replicas explode it ×B and reduce map-side.
    */
  def permutationTestDailyDiff(events0: DataFrame, typeA: String = "click",
      typeB: String = "view", reps: Int = 64): DataFrame = {
    require(reps >= 1, s"permutationTestDailyDiff: reps >= 1, got $reps")
    val dayNs = 86400L * 1000000000L
    val daily = EventTime.toNanos(events0)
      .filter(col("event_type").isin(typeA, typeB))
      .groupBy(expr(s"ts div $dayNs").as("day"))
      .agg(sum(when(col("event_type") === typeA,
        expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
        .otherwise(0L)).as("xa"),
        sum(when(col("event_type") === typeB,
          expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
          .otherwise(0L)).as("xb"))
      .select(col("day"), (col("xa") - col("xb")).as("diff"))
    val obs = daily.agg(count(lit(1)).as("n_days"),
      abs(sum(col("diff"))).as("s_obs"))
    val flips = daily
      .select(col("day"), col("diff"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .withColumn("u", expr(
        "CAST(conv(substring(md5(concat('perm-', CAST(rep AS STRING), " +
          "':', CAST(day AS STRING))), 1, 6), 16, 10) AS BIGINT)"))
      .withColumn("s", when(col("u") < 8388608L, col("diff"))
        .otherwise(-col("diff")))
      .groupBy(col("rep")).agg(abs(sum(col("s"))).as("s_rep"))
    flips.crossJoin(broadcast(obs))
      .agg(max(col("n_days")).as("n_days"),
        max(col("s_obs")).as("s_obs_cents"),
        count(lit(1)).as("b_reps"),
        sum(expr("CAST(s_rep >= s_obs AS BIGINT)")).as("n_ge"))
      .withColumn("p_milli", expr(
        "(1000 * (1 + n_ge)) div (b_reps + 1)"))
  }

  /** Benjamini–Hochberg FDR control over the per-type Mann–Kendall
    * trend tests — the multiple-testing gate a monitoring deployment
    * needs once it runs one trend test PER SERIES: order the m tests by
    * significance (z² descending = p ascending, ties broken by type
    * name), reject ranks 1..i* where i* is the largest rank whose
    * statistic clears the χ²₁(0.05·r/m) critical. Those criticals stay
    * FROZEN because every fraction r/m for m ≤ 6 reduces to one of 12
    * milli-ceiled literals keyed by (60·r) div m (exact since every
    * m ≤ 6 divides 60); more than 6 series ships NULL criticals and
    * rejects nothing — the honest out-of-table answer. The whole BH
    * walk is a types-sized window over [[mannKendallDailyTrend]].
    */
  def mannKendallFdrBH(events0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mk = mannKendallDailyTrend(events0)
      .select(col("event_type"), col("z2_milli"))
    val wAll = Window.rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = mk
      .withColumn("p_rank", row_number().over(
        Window.orderBy(col("z2_milli").desc, col("event_type"))).cast("long"))
      .withColumn("m_tests", count(lit(1)).over(wAll))
      .withColumn("crit_milli", expr(
        "CASE (60 * p_rank) div m_tests WHEN 10 THEN 6961 " +
          "WHEN 12 THEN 6635 WHEN 15 THEN 6239 WHEN 20 THEN 5732 " +
          "WHEN 24 THEN 5412 WHEN 30 THEN 5024 WHEN 36 THEN 4710 " +
          "WHEN 40 THEN 4529 WHEN 45 THEN 4328 WHEN 48 THEN 4218 " +
          "WHEN 50 THEN 4149 WHEN 60 THEN 3842 ELSE NULL END"))
    ranked
      .withColumn("istar", max(when(col("z2_milli") >= col("crit_milli"),
        col("p_rank"))).over(wAll))
      .select(col("event_type"), col("p_rank"), col("m_tests"),
        col("z2_milli"), col("crit_milli").cast("long").as("crit_milli"),
        expr("CAST(p_rank <= coalesce(istar, 0) AS INT)")
          .as("reject_fdr_05"))
  }

  /** Spearman rank correlation between two event types' daily volumes
    * (do clicks and purchases co-move day to day?) — computed as Pearson
    * over tie-averaged ranks, the form that stays valid under ties where
    * the 6Σd² shortcut does not. Both series live on the shared dense
    * day grid (zero-filled), so every relation — the grid, the per-value
    * tie groups, the two ranking windows — is CALENDAR-bounded. Ranks
    * ship doubled (2·avgrank = 2·C(<v) + t + 1, integral under ties);
    * the signed square of ρ ships in exact ppm via one DECIMAL(38,0)
    * cross-multiplication, the [[DataQuality.kendallGridCorr]]
    * convention (n ≈ 2.4·10³ days ⇒ num² ≈ 10²⁸ ≪ 10³⁸).
    *
    * EAGER at construction: the zero-filled day relation feeds five
    * consumers (two rank windows, two tie aggregates, the moment join),
    * so the corpus-sized scan behind it is cut once via `materialize`
    * (sf1 measured 5.5× warm lazy → cut; the RepeatAudit class). Pass
    * [[graft.engine.Materialize.none]] to stay lazy.
    */
  def spearmanDailyCorr(events0: DataFrame, typeA: String = "click",
      typeB: String = "purchase",
      materialize: DataFrame => DataFrame =
        graft.engine.Materialize.local): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = "DECIMAL(38,0)"
    val dayNs = 86400L * 1000000000L
    val e = EventTime.toNanos(events0)
      .filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type"), expr(s"ts div $dayNs").as("day"))
    val grid = e.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("day"))
    val cnt = e.groupBy(col("day"))
      .agg(sum(when(col("event_type") === typeA, 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === typeB, 1L).otherwise(0L)).as("y"))
    val days = materialize(
      grid.join(cnt, Seq("day"), "left").na.fill(0L, Seq("x", "y")))
    def rank2(v: String): DataFrame = {
      val byV = days.groupBy(col(v)).agg(count(lit(1)).as("t"))
      val w = Window.orderBy(col(v))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byV.withColumn("cumt", sum(col("t")).over(w))
        .select(col(v), expr("2 * (cumt - t) + t + 1").as(s"r2$v"),
          expr("t * t * t - t").as(s"tie_$v"))
    }
    // Each rank relation feeds two consumers (the day join and its tie
    // aggregate) but stays LAZY: both read it through identical plans
    // over the already-cut `days`, so AQE reuses the exchange — cutting
    // the ranks too was measured 1.6× slower at sf1 (0.81 → 1.31 s).
    val rx = rank2("x")
    val ry = rank2("y")
    // Σ(t³−t) per axis aggregates over DISTINCT values (one row each),
    // broadcast in — summing it over the day join would count each tie
    // group t times.
    val tx = rx.agg(sum(col("tie_x")).as("tie_x"))
    val ty = ry.agg(sum(col("tie_y")).as("tie_y"))
    days
      .join(rx.drop("tie_x"), Seq("x"))
      .join(ry.drop("tie_y"), Seq("y"))
      .agg(count(lit(1)).cast(d).as("n"),
        sum(col("r2x").cast(d)).as("sx"), sum(col("r2y").cast(d)).as("sy"),
        sum(expr(s"CAST(r2x AS $d) * r2y")).as("sxy"),
        sum(expr(s"CAST(r2x AS $d) * r2x")).as("sxx"),
        sum(expr(s"CAST(r2y AS $d) * r2y")).as("syy"))
      .crossJoin(broadcast(tx)).crossJoin(broadcast(ty))
      .withColumn("num", expr("n * sxy - sx * sy"))
      // a constant series zeroes its den factor — num is 0 there too, so
      // the guarded ρ² reads 0 instead of ANSI DIVIDE_BY_ZERO
      .withColumn("den", expr(
        "CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN 1 " +
          "ELSE (n * sxx - sx * sx) * (n * syy - sy * sy) END"))
      .select(col("n").cast("long").as("n_days"), col("tie_x"), col("tie_y"),
        expr("CAST(CASE WHEN num < 0 THEN -((num * num * 1000000) div den) " +
          "ELSE ((num * num * 1000000) div den) END AS BIGINT)")
          .as("rho2_signed_ppm"))
  }

  /** Heavy changers: the (user, event type) pairs whose activity moved
    * most between the first and second half of the observed range — the
    * exact form of the "heavy change detection" question sketch deltas
    * (Cormode & Muthukrishnan's CM deltas) answer approximately. The
    * split point is the integer midpoint of the global [min ts, max ts]
    * span (a one-row broadcast); each pair gets its two half-counts in
    * one conditional aggregate, delta = n2 − n1, and the k most-moved
    * rows surface via TakeOrdered with a full deterministic tie-break
    * (|delta| desc, user, type). ratio_bp = n2·10⁴ div max(1, n1) reads
    * growth. One scan + one pair-keyed shuffle at any scale.
    */
  def heavyChangers(events0: DataFrame, k: Int = 25): DataFrame = {
    val e = EventTime.toNanos(events0)
      .select(col("user_id"), col("event_type"), col("ts"))
    val mid = e.agg(
      expr("(min(ts) + max(ts)) div 2").as("mid_ns"))
    e.crossJoin(broadcast(mid))
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        sum(when(col("ts") < col("mid_ns"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("ts") >= col("mid_ns"), 1L).otherwise(0L)).as("n2"))
      .withColumn("delta", col("n2") - col("n1"))
      .withColumn("ratio_bp", expr("(n2 * 10000L) div greatest(1L, n1)"))
      .orderBy(abs(col("delta")).desc, col("user_id"), col("event_type"))
      .limit(k)
  }

  /** Poisson-bootstrap confidence band for mean daily purchase revenue —
    * the single-pass distributed bootstrap (Chamandy et al., "Estimating
    * uncertainty for massive data streams", Google 2012): resample
    * replica `b` weights each day by an independent Poisson(1) draw, and
    * the spread of the replica means IS the sampling distribution of the
    * estimator. Every draw is a DETERMINISTIC md5 inverse-CDF lookup —
    * u = first 6 md5 hex digits of "boot-b:day" as an integer in
    * [0, 16⁶), laddered through the FROZEN Poisson(1) CDF thresholds in
    * 16⁶ths (the nDCG-discount trick: the one transcendental, e, enters
    * only via shared integer literals) — so replicas are identical in
    * any engine and any partitioning. Emits one row per replica: its
    * total day weight and its weighted mean in cents (floor division;
    * 0-weight replicas are impossible beyond toy spans but guarded).
    * The day relation is span-bounded, replicas explode it ×`reps`, and
    * the aggregate is map-side combining — the whole bootstrap costs one
    * scan plus a reps×days-sized shuffle regardless of event volume.
    */
  def bootstrapDailyMeanCI(events0: DataFrame, reps: Int = 32): DataFrame = {
    require(reps >= 1, s"bootstrapDailyMeanCI: reps >= 1, got $reps")
    val dayNs = 86400L * 1000000000L
    // Poisson(1) CDF in 16^6ths: floor(16^6 · Σ_{i<=n} e^{-1}/i!)
    // for n = 0..6; a draw past the last threshold weights 7.
    val thresholds = Seq(6171992L, 12343985L, 15429982L, 16458647L,
      16715813L, 16767247L, 16775819L)
    val daily = EventTime.toNanos(events0)
      .filter(col("event_type") === "purchase")
      .groupBy(expr(s"ts div $dayNs").as("day"))
      .agg(expr("CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)")
        .as("day_cents"))
    val u = expr(
      "CAST(conv(substring(md5(concat('boot-', CAST(rep AS STRING), ':', " +
        "CAST(day AS STRING))), 1, 6), 16, 10) AS BIGINT)")
    val wCase = thresholds.zipWithIndex
      .foldRight(lit(7L): Column) { case ((t, i), rest) =>
        when(col("u") < t, i.toLong).otherwise(rest)
      }
    daily
      .select(col("day"), col("day_cents"),
        explode(sequence(lit(0), lit(reps - 1))).as("rep"))
      .withColumn("u", u)
      .withColumn("w", wCase)
      .groupBy(col("rep"))
      .agg(sum(col("w")).as("sum_w"),
        sum(col("w") * col("day_cents")).as("w_cents"))
      .withColumn("boot_mean_cents",
        expr("CASE WHEN sum_w = 0 THEN 0L ELSE w_cents div sum_w END"))
      .select(col("rep").cast("long").as("rep"), col("sum_w"),
        col("boot_mean_cents"))
  }
}
