package graft.tools

import graft.analytics.Dedup
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for hot queries (dev tool). */
object Profile {
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
    docs.count() // warm
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    {
      import graft.engine.{Catalog, Subsetter}
      import graft.queries.SubsetQueries
      var source: Map[String, org.apache.spark.sql.DataFrame] = null
      time("catalog_load") { source = Catalog.load(spark, dir, SubsetQueries.starTables); 0L }
      var dest: Map[String, org.apache.spark.sql.DataFrame] = null
      time("run_plan_only") {
        dest = new Subsetter(SubsetQueries.fixtureConfig, source).run()
          .map { case (t, df) => t -> df.persist() }
        0L
      }
      time("first_count_customer")(dest("customer").count())
      time("count_rest")(dest.values.map(_.count()).sum)
      time("count_again_cached")(dest.values.map(_.count()).sum)
      val source2 = Catalog.load(spark, dir, SubsetQueries.starTables)
      time("run2_nocut_plan") {
        new Subsetter(SubsetQueries.fixtureConfig, source2,
          materializeThreshold = Long.MaxValue).run()
        0L
      }
    }
    time("tokens+explode")(docs.selectExpr("doc_id", "explode(split(text, ' ')) AS t").count())
    time("shingles_nodistinct")(
      docs.selectExpr("doc_id",
        "explode(CASE WHEN size(split(text,' ')) >= 3 THEN transform(sequence(1, size(split(text,' '))-2), i -> concat_ws(' ', element_at(split(text,' '), i), element_at(split(text,' '), i+1), element_at(split(text,' '), i+2))) ELSE array() END) AS s").count())
    time("shingles+distinct")(Dedup.shingles(docs).count())
    time("minhash_signatures")(Dedup.minHashSignatures(docs).count())
    time("lsh_bands")(Dedup.lshBands(docs).count())
    time("lsh_pairs_full")(Dedup.lshCandidatePairs(docs).count())
    spark.stop()
  }
}
