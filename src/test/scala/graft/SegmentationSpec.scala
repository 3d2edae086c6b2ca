package graft

import graft.queries.ExtensionQueries
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Hand-computed RFM segmentation over a synthetic orders table written to
  * a temp dir (the key reads `$dir/orders.parquet` like the driver does).
  */
class SegmentationSpec extends SparkSpecBase {

  test("RFM quartile scores and segments match a hand-built crossing pattern") {
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderdate", TimestampType),
      StructField("o_totalprice", DoubleType)))
    def ts(day: Int) =
      java.sql.Timestamp.valueOf(f"1996-01-$day%02d 00:00:00")
    // customer k places k orders of 100.00 on day (10 - k): recency rank
    // and frequency/monetary rank run in OPPOSITE directions
    val rows = for (k <- 1 to 4; i <- 1 to k)
      yield Row(k.toLong * 10 + i, k.toLong, ts(10 - k), 100.0)
    val dir = java.nio.file.Files.createTempDirectory("graft_rfm").toString
    spark.createDataFrame(rows.asJava, schema)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = ExtensionQueries.queries("customer_rfm_segments")(spark, dir)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(7)))).toMap
    // r_days = k-1; f = k; m_cents = k * 10000
    assert(got(1L) == ((0L, 1L, 10000L, "411")))
    assert(got(2L) == ((1L, 2L, 20000L, "322")))
    assert(got(3L) == ((2L, 3L, 30000L, "233")))
    assert(got(4L) == ((3L, 4L, 40000L, "144")))
  }
}
