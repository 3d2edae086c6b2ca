package graft

import graft.engine.Layout
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpecBase {

  test("z-value interleaves bits (known points)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
    val got = df.select(Layout.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // interleave(3=0b011, 5=0b101) = b2 a2 b1 a1 b0 a0 = 1 0 0 1 1 1 = 39
    assert(got == Seq(0L, 1L, 2L, 39L, (1L << 32) - 1))
  }

  test("z-ordered layout gives tight per-partition envelopes in BOTH dims") {
    // bucketize both dims to the same 6-bit width first — the z-curve
    // contract: interleaving is only meaningful over comparable bit widths
    // (a raw 4-bit dim against a 9-bit dim degenerates to single-dim sort)
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"),
        floor(col("value")).cast("long").as("vb"))
    val m = raw.agg(max("user_id"), max("vb")).head
    val (umax, vmax) = (m.getLong(0), m.getLong(1))
    val ev = raw.select(col("event_id"),
      floor(col("user_id") * 64.0 / (umax + 1)).cast("long").as("u6"),
      floor(col("vb") * 64.0 / (vmax + 1)).cast("long").as("v6"))
    val z = Layout.zorderBy(ev, col("u6"), col("v6"),
      bits = 6, numPartitions = 16)
    val stats = z.withColumn("pid", spark_partition_id())
      .groupBy(col("pid")).agg(
        (max("u6") - min("u6")).as("uw"),
        (max("v6") - min("v6")).as("vw"))
      .collect()
    val g = ev.agg(
      (max("u6") - min("u6")).cast("double"),
      (max("v6") - min("v6")).cast("double")).head
    val (gu, gv) = (g.getDouble(0), g.getDouble(1))
    val avgU = stats.map(_.getLong(1)).sum.toDouble / stats.length
    val avgV = stats.map(_.getLong(2)).sum.toDouble / stats.length
    // a random layout would leave every partition spanning ~the full range
    // in both dims; the z-curve must tighten both simultaneously
    assert(avgU < 0.6 * gu, s"avg u6 width $avgU vs global $gu")
    assert(avgV < 0.6 * gv, s"avg v6 width $avgV vs global $gv")
  }
}
