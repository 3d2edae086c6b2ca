package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off diagnostic for the pair-verify cost model (dev tool):
  * prints the relation sizes that decide which exact-verify formulation
  * wins at a given scale — candidate count, candidate×shingle explode
  * volume (the current exactJaccardOnPairs intermediate), and the
  * Σ C(df,2) co-occurrence volume (the all-pairs alternative).
  *
  *   runMain graft.tools.DedupDiag target/sf10
  */
object DedupDiag {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "64g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val sh = graft.analytics.Dedup.shingles(docs, 3).cache()
    val nDocs = docs.count()
    val nSh = sh.count()
    val df = sh.groupBy("s").agg(count(lit(1)).as("df")).cache()
    val capped = df.filter(col("df") <= 100)
    val nCapped = capped.agg(sum("df")).head.getLong(0)
    val coVol = capped.agg(sum(expr("df * (df - 1) div 2"))).head.getLong(0)
    val shD = sh.join(capped, Seq("s"))
    val sizes = shD.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val szStats = sizes.agg(avg("sz"), max("sz")).head
    // prefix relation at t=4/5 (jaccard_prefix_pairs defaults)
    import org.apache.spark.sql.expressions.Window
    val prefix = shD
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .join(sizes, Seq("doc_id"))
      .filter(col("rn") <= col("sz") - expr("(sz * 4 + 4) div 5") + 1)
      .select(col("doc_id"), col("s"))
    val nPrefix = prefix.count()
    val cand = prefix.toDF("id_a", "s")
      .join(prefix.toDF("id_b", "s2"),
        col("s") === col("s2") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct().cache()
    val nCand = cand.count()
    // current verify intermediate: cand exploded by A's shingles
    val explodeVol = cand.join(sizes.toDF("id_a", "sz"), "id_a")
      .agg(sum("sz")).head.getLong(0)
    println(f"DIAG docs=$nDocs%,d shingleRows=$nSh%,d cappedRows=$nCapped%,d")
    println(f"DIAG avgSz=${szStats.getDouble(0)}%.1f maxSz=${szStats.getLong(1)}%,d")
    println(f"DIAG prefixRows=$nPrefix%,d cand=$nCand%,d")
    println(f"DIAG explodeVol(cand x szA)=$explodeVol%,d  coVol(sum C(df,2))=$coVol%,d")

    // A/B the verify formulations (wall time, 2 reps each)
    def time(name: String)(f: => Long): Unit = (1 to 2).foreach { r =>
      val t0 = System.nanoTime()
      val n = f
      println(f"TIME $name rep$r ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$n%,d")
    }
    val shP = sh.select("doc_id", "s")
    val sizesP = sizes
    // (b) pure all-pairs co-occurrence at 4/5, no doc restriction,
    // s-clustering preserved (the ngram shape)
    time("allpairs45") {
      val a = shP.toDF("id_a", "s")
      val b = shP.toDF("id_b", "s")
      a.join(b, a("s") === b("s") && a("id_a") < b("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
        .join(sizesP.toDF("id_a", "sz_a"), "id_a")
        .join(sizesP.toDF("id_b", "sz_b"), "id_b")
        .filter(lit(5) * col("n_common") >=
          lit(4) * (col("sz_a") + col("sz_b") - col("n_common")))
        .count()
    }
    // (a) the shipped prefix-filter path
    time("prefixNew") {
      graft.analytics.Dedup.prefixFilterJaccardPairs(docs).count()
    }
    spark.stop()
  }
}
