package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embeddings-only fixture scale-up (dev tool): the vector-decade companion
  * to [[ScaleUp]]. The r17 sf10 decade proved the relational/events side at
  * 60M rows but the vector side only to 200k embeddings — three decades
  * short of where the adaptive-nlist cap (2^12 cells, binding at n ≈ 17M)
  * changes the SemDeDup/ANN candidate regime. Replicating ONLY the
  * embeddings table (a 20M-row 64-dim corpus is ~5 GB — cheap next to a
  * full sf100 build) puts the measurement where that design risk actually
  * lives.
  *
  * Same replication contract as [[ScaleUp]]: replica i shifts vec_id by
  * i·base and perturbs each coordinate by a small deterministic hash offset
  * (so ANN neighborhoods are not mult-way exact ties and near-dup
  * components grow ~linearly like a real bigger corpus). The out dir gets
  * embeddings.parquet only — sweep keys that read other tables must point
  * elsewhere.
  *
  *   runMain graft.tools.VecScaleUp <srcSfDir> <outDir> [mult=10]
  */
object VecScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val mult = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val base = emb.agg(max(col("vec_id")).cast("long")).head.getLong(0) + 1
    val t0 = System.nanoTime()
    (0 until mult).map { i =>
      val shifted = emb.withColumn("vec_id",
        (col("vec_id") + lit(i * base)).cast(emb.schema("vec_id").dataType))
      if (i == 0) shifted
      else shifted.withColumn("embedding", expr(
        s"transform(embedding, (x, j) -> " +
          s"CAST(x + (pmod(hash(vec_id, j, $i), 997) - 498) / 100000.0 AS FLOAT))"))
    }.reduce(_ unionByName _)
      .repartition(math.max(32, mult))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(f"scaled embeddings x$mult (base $base) in " +
      f"${(System.nanoTime() - t0) / 1e9}%6.1fs -> $out")
    spark.stop()
  }
}
