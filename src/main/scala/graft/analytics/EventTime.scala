package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-adaptive event-time handling.
  *
  * Event tables arrive in both physical forms real pipelines produce:
  *   - `BIGINT` epoch nanoseconds (parquet `timestamp[ns]` read under
  *     `spark.sql.legacy.parquet.nanosAsLong=true`, or an int64 column),
  *   - native `TIMESTAMP` / `TIMESTAMP_NTZ` (parquet `timestamp[us]`, the
  *     form pandas/pyarrow writes by default).
  *
  * Every analytic in this package computes on ONE canonical representation —
  * epoch-nanosecond longs — so each entry point normalizes its time columns
  * here instead of scattering per-type arithmetic through 18 call sites.
  * Normalization is idempotent (already-long columns pass through untouched)
  * and purely map-side (one codegen'd projection, no shuffle), so calling it
  * defensively at both the loader and the operator costs nothing at 100 TB.
  *
  * `TIMESTAMP_NTZ → TIMESTAMP` casting reinterprets the naive wall-clock in
  * the session time zone; every session in this library pins
  * `spark.sql.session.timeZone=UTC`, which matches DuckDB's `epoch_ns` /
  * `epoch_us` reading of naive timestamps — so both engines see identical
  * integers.
  */
object EventTime {

  /** Human-readable list for the fail-fast message. */
  private val accepted =
    "BIGINT (epoch nanoseconds), TIMESTAMP, or TIMESTAMP_NTZ"

  /** Epoch-nanosecond expression for a time column of any accepted type.
    * Fails fast with a single clear message on fixture-schema drift instead
    * of letting a type mismatch surface as scattered analysis exceptions.
    */
  def nanos(dt: DataType, name: String): Column = dt match {
    case LongType => col(name)
    case TimestampType | TimestampNTZType =>
      unix_micros(col(name).cast(TimestampType)) * lit(1000L)
    case other =>
      throw new IllegalArgumentException(
        s"event-time column `$name` has unsupported type ${other.sql}; " +
          s"expected $accepted. If the fixture schema changed, regenerate " +
          "the fixtures or extend graft.analytics.EventTime.")
  }

  /** Normalize the named time columns (those present) to epoch-nanosecond
    * longs. Idempotent; map-side only.
    */
  def toNanos(df: DataFrame, cols: Seq[String] = Seq("ts")): DataFrame =
    cols.filter(df.columns.contains).foldLeft(df) { (d, c) =>
      if (d.schema(c).dataType == LongType) d
      else d.withColumn(c, nanos(df.schema(c).dataType, c))
    }

  /** TimestampType event-time column (for `window`/`session_window`/
    * watermarks) from a `ts` of any accepted type. Truncates ns → µs, which
    * is exactly DuckDB's TIMESTAMP precision.
    */
  def tsdExpr(dt: DataType, name: String = "ts"): Column = dt match {
    case LongType => timestamp_micros(expr(s"$name div 1000"))
    case TimestampType | TimestampNTZType => col(name).cast(TimestampType)
    case other => nanos(other, name) // raises the fail-fast message
  }

  /** Attach the canonical `tsd` TimestampType column (and keep `ts` in its
    * source form). Works on batch and streaming DataFrames alike.
    */
  def withTsd(df: DataFrame, name: String = "ts"): DataFrame =
    df.withColumn("tsd", tsdExpr(df.schema(name).dataType, name))

  /** Fail-fast fixture assertion: verify `colName` on `df` is an accepted
    * event-time type, naming the table in the error. Used by loaders so one
    * schema regen produces one clear message, not 18 scattered crashes.
    */
  def requireEventTime(table: String, df: DataFrame, colName: String): Unit =
    df.schema.fields.find(_.name == colName).foreach { f =>
      f.dataType match {
        case LongType | TimestampType | TimestampNTZType => ()
        case other =>
          throw new IllegalArgumentException(
            s"fixture `$table`.`$colName` has unsupported type " +
              s"${other.sql}; expected $accepted — fixture schema drift. " +
              "Regenerate fixtures or extend graft.analytics.EventTime.")
      }
    }
}
