package graft.tools

import graft.analytics.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc breakdown of the IVF-PQ probe's per-query jobs (dev tool):
  * which of head-read / query-vector read / ADC shortlist / exact rerank
  * carries the probe latency.
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.NativeExpressions.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val indexDir = Similarity.defaultIndexDir(dir) + "/ivfpq"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBEPROF $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      r
    }
    time("warmup_tiny")(emb.limit(8).agg(sum(expr("float_dot(embedding, embedding)"))).count())
    time("index_build_if_stale")(
      Similarity.ivfPqIndexBuildIfStale(emb, indexDir, trainMod = 4))
    // per-Spark-job wall time during the probe, to attribute the latency
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js2: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobStarts.put(js2.jobId, System.nanoTime())
        println(s"PROBEPROF   job${js2.jobId} START " +
          js2.stageInfos.map(_.name.takeWhile(_ != '\n').take(60)).mkString(" | "))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = jobStarts.getOrDefault(je.jobId, 0L)
        if (t0 > 0) println(f"PROBEPROF   job${je.jobId}%-4d ${(System.nanoTime() - t0) / 1e9}%7.3fs")
      }
    })
    (1 to 3).foreach { rep =>
      time(s"rep$rep qv_read")(
        emb.filter(col("vec_id") === 0L).select(col("embedding")).collect())
      time(s"rep$rep full_probe")(
        Similarity.ivfPqProbeTopK(emb, indexDir, queryId = 0L, k = 10).count())
    }
    spark.stop()
  }
}
