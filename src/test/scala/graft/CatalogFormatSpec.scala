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

  test("schema evolution: mergeSchema unions columns across parquet batches") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("graft_evolve").toString
    // day-1 batch: (r_regionkey, r_name); day-2 batch adds a column
    region.select(col("r_regionkey"), col("r_name"))
      .write.parquet(s"$dir/batch=1")
    region.select(col("r_regionkey"), col("r_name"),
        lit("v2").as("ingest_tag"))
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ==
      Set("r_regionkey", "r_name", "ingest_tag", "batch"))
    assert(merged.count() == 2 * region.count())
    // old rows surface the new column as NULL, new rows carry it
    assert(merged.filter(col("batch") === 1 && col("ingest_tag").isNull)
      .count() == region.count())
    assert(merged.filter(col("batch") === 2 && col("ingest_tag") === "v2")
      .count() == region.count())
  }

  test("jdbc roundtrip via embedded Derby preserves rows") {
    // the closest in-container stand-in for the reference's live
    // Postgres/MySQL source (/root/reference/db_connect.py:29-36): a real
    // JDBC url, a real driver, genuine INSERT/SELECT round-trip
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    Catalog.saveJdbc(region, url, "region_rt", props)
    val back = Catalog.loadJdbc(spark, url, "region_rt", props)
    assert(back.count() == region.count())
    assert(back.columns.sorted.toSeq == region.columns.sorted.toSeq)
    assert(rows(back.selectExpr("r_regionkey", "r_name")) ==
      rows(region.selectExpr("r_regionkey", "r_name")))
  }

  test("jdbc dbtable accepts a pushdown subquery") {
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    Catalog.saveJdbc(region.limit(5), url, "region_q", props)
    // Spark's JDBC writer quotes column identifiers, so Derby stores them
    // case-sensitive — the pushdown subquery must quote them too
    val sub = Catalog.loadJdbc(spark, url,
      "(SELECT \"r_regionkey\" FROM region_q WHERE \"r_regionkey\" < 2) t", props)
    assert(sub.columns.toSeq.map(_.toLowerCase) == Seq("r_regionkey"))
    assert(sub.count() == 2)
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
