package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series analytics over the `events` fixture (SURVEY.md §7.5).
  * The `ts` column arrives as Long nanoseconds (Spark 4 +
  * `spark.sql.legacy.parquet.nanosAsLong=true`); conversion to TimestampType
  * truncates to microseconds, matching DuckDB's µs TIMESTAMP semantics.
  *
  * Window starts are reported as epoch seconds (BIGINT) so oracle comparison
  * never depends on timestamp-type hashing.
  */
object EventsAnalytics {

  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("tsd", expr("timestamp_micros(ts div 1000)"))

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
  def scd2Snapshot(events: DataFrame): DataFrame = {
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
}
