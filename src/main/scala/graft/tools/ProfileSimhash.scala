package graft.tools

import graft.analytics.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage decomposition of the wide/128-bit simhash keys (dev tool). */
object ProfileSimhash {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    for (bits <- Seq(64, 128)) {
      time(s"signatures_$bits")(Dedup.simhashSignatures(docs, bits).count())
      time(s"signatures_${bits}_ckpt")(
        graft.engine.Materialize.local(Dedup.simhashSignatures(docs, bits)).count())
    }
    time("pairs_r12_64")(Dedup.simhashNearDupPairs(docs, maxDist = 12).count())
    time("pairs_r12_128")(
      Dedup.simhashNearDupPairs(docs, maxDist = 12, sigBits = 128).count())
    time("pairs_r12_128_again")(
      Dedup.simhashNearDupPairs(docs, maxDist = 12, sigBits = 128).count())
    spark.stop()
  }
}
