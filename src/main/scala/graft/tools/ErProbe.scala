package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B profiler for er_blocking_eval truth variants (dev tool). */
object ErProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cust = spark.read.parquet(s"$dir/customer.parquet")
    cust.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"ERPROBE $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
    }
    val dv =
      "array_distinct(array_union(array(name), " +
        "transform(sequence(1, length(name)), " +
        "i -> concat(substring(name, 1, i - 1), substring(name, i + 1, length(name))))))"
    val base = cust.select(col("c_custkey").as("rid"), col("c_name").as("name"))
    def vRel: DataFrame =
      base.select(col("rid"), col("name"), explode(expr(dv)).as("vv"))
    def truthOf(v: DataFrame, filterFirst: Boolean): DataFrame = {
      val joined = v.alias("a").join(v.alias("b"),
          col("a.vv") === col("b.vv") && col("a.rid") < col("b.rid"))
        .select(col("a.rid").as("id_a"), col("b.rid").as("id_b"),
          col("a.name").as("name_a"), col("b.name").as("name_b"))
      if (filterFirst)
        joined.filter(expr("levenshtein(name_a, name_b, 1) >= 0"))
          .select(col("id_a"), col("id_b")).distinct()
      else
        joined.distinct()
          .filter(expr("levenshtein(name_a, name_b, 1) >= 0"))
          .select(col("id_a"), col("id_b"))
    }
    (1 to 2).foreach { i =>
      time(s"B_vmat_filter_first_rep$i") {
        truthOf(vRel.localCheckpoint(), filterFirst = true)
          .localCheckpoint().count()
      }
      time(s"E_repart_vmat_filter_first_rep$i") {
        truthOf(vRel.repartition(32, col("vv")).localCheckpoint(),
          filterFirst = true).localCheckpoint().count()
      }
      time(s"F_bcast_selfjoin_rep$i") {
        val v = vRel.repartition(32).localCheckpoint()
        v.alias("a").join(broadcast(v).alias("b"),
            col("a.vv") === col("b.vv") && col("a.rid") < col("b.rid"))
          .filter(expr("levenshtein(a.name, b.name, 1) >= 0"))
          .select(col("a.rid").as("id_a"), col("b.rid").as("id_b"))
          .distinct().localCheckpoint().count()
      }
      time(s"G_bcast_nomat_rep$i") {
        val v = vRel.repartition(32)
        v.alias("a").join(broadcast(vRel).alias("b"),
            col("a.vv") === col("b.vv") && col("a.rid") < col("b.rid"))
          .filter(expr("levenshtein(a.name, b.name, 1) >= 0"))
          .select(col("a.rid").as("id_a"), col("b.rid").as("id_b"))
          .distinct().localCheckpoint().count()
      }
    }
    spark.stop()
  }
}
