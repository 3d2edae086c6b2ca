package graft.tools

import graft.analytics.Dedup
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-scale probe (dev tool): replicate the documents corpus
  * `mult`× with shifted ids — every document becomes a `mult`-way exact
  * near-duplicate group, the duplicate-heavy regime that historically blew
  * up combination-based simhash candidate generation — and time the
  * near-dup pipeline at 1× vs `mult`×. Healthy scaling: time grows ~with
  * input+output size (pair OUTPUT inherently grows ~mult² per group), not
  * explosively beyond it.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.ScaleProbe [mult]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = if (args.nonEmpty) args(0).toInt else 4
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val dup = (0 until mult).map(i =>
      docs.withColumn("doc_id", col("doc_id") + lit(i * 10L * n)))
      .reduce(_ unionByName _)
      .repartition(32).localCheckpoint() // materialize the input fairly

    def time(name: String, f: DataFrame => DataFrame): Unit = {
      Seq(("1x", docs), (s"${mult}x", dup)).foreach { case (tag, d) =>
        val t0 = System.nanoTime()
        val rows = f(d).count()
        println(f"PROBE $name%-28s $tag%4s in=${d.count()}%7d " +
          f"out=$rows%9d ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      }
    }
    time("simhash_r3_pairs", d => Dedup.simhashNearDupPairs(d, maxDist = 3))
    time("minhash_lsh_pairs", d => Dedup.lshCandidatePairs(d))
    time("neardup_components", d => Dedup.connectedComponents(
      Dedup.lshCandidatePairs(d).select(col("id_a"), col("id_b"))))
    time("fingerprint_groups", d => Dedup.fingerprintGroups(d))
    spark.stop()
  }
}
