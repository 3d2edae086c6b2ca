package graft

import graft.engine.Catalog
import java.nio.file.Files
import org.apache.spark.sql.Row

/** Source/sink format parity: the reference swaps whole database backends by
  * a `db_type` string (/root/reference/db_connect.py:10-36); our equivalent
  * is the Spark DataSource `format`. A table written to CSV or JSON and read
  * back must carry the same rows, and (with an explicit schema) the same
  * column types as the Parquet original.
  */
class CatalogFormatSpec extends SparkSpecBase {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Row] = {
    val cols = df.columns.sorted
    df.select(cols.head, cols.tail: _*).collect().toSet
  }

  private lazy val region =
    spark.read.parquet(s"$sfDir/region.parquet")

  test("csv roundtrip preserves rows and, with explicit schema, types") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Catalog.saveTable(region, s"$dir/region", "csv")
    val back = Catalog.loadTable(spark, s"$dir/region", "csv",
      schema = Some(region.schema))
    assert(back.schema == region.schema)
    assert(rows(back) == rows(region))
  }

  test("json roundtrip preserves rows with explicit schema") {
    val dir = Files.createTempDirectory("graft_json").toString
    Catalog.saveTable(region, s"$dir/region", "json")
    val back = Catalog.loadTable(spark, s"$dir/region", "json",
      schema = Some(region.schema))
    assert(rows(back) == rows(region))
  }

  test("csv inference reads a numeric/string table without a schema") {
    val dir = Files.createTempDirectory("graft_csv2").toString
    val nation = spark.read.parquet(s"$sfDir/nation.parquet")
    Catalog.saveTable(nation, s"$dir/nation", "csv")
    val back = Catalog.loadTable(spark, s"$dir/nation", "csv")
    assert(back.count() == nation.count())
    assert(back.columns.toSeq == nation.columns.toSeq)
  }

  test("partitioned layout prunes non-matching partitions at scan time") {
    val dir = Files.createTempDirectory("graft_part").toString
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    Catalog.savePartitioned(events, s"$dir/events", Seq("event_type"))
    val clicks = spark.read.parquet(s"$dir/events")
      .filter(org.apache.spark.sql.functions.col("event_type") === "click")
    // the predicate must land in PartitionFilters (directory pruning),
    // not in the row-level data filters
    val scan = clicks.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan)
    assert(scan.contains("(event_type"), scan)  // the equality predicate too
    // and no row-level data filter remains — pruning did all the work
    assert(scan.contains("DataFilters: []"), scan)
    assert(clicks.count() ==
      events.filter(org.apache.spark.sql.functions.col("event_type") === "click").count())
  }

  test("orc roundtrip preserves rows and schema exactly") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val customer = spark.read.parquet(s"$sfDir/customer.parquet")
    Catalog.saveTable(customer, s"$dir/customer", "orc")
    val back = Catalog.loadTable(spark, s"$dir/customer", "orc")
    assert(back.schema == customer.schema)
    assert(rows(back) == rows(customer))
  }
}
