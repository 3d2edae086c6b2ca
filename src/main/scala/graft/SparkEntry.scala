package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query surface is assembled from per-domain modules:
  *   - [[graft.queries.CoreQueries]]      — reference-parity operators (SURVEY §2)
  *   - [[graft.queries.SubsetQueries]]    — end-to-end middle-out subsetter outputs
  *   - [[graft.queries.ExtensionQueries]] — training-data pipeline operators
  *     (dedup, similarity, text/corpus statistics, time-series, multimodal)
  * Every key has a DuckDB oracle unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.queries ++ SubsetQueries.queries ++ ExtensionQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracles ++ SubsetQueries.oracles ++ ExtensionQueries.oracles
}
