package graft.tools

import graft.analytics.EntityResolution
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off A/B profiler for er_blocking_eval (dev tool): lazy (AQE stage
  * reuse dedups the identically-consumed truth subtree) vs lineage-cut,
  * wall + executor task totals via a stage listener. r16 measurements at
  * sf0.1/local[32] (warm rep): lazy 69 tasks / 2.6 s, full cut 165 tasks /
  * 2.3 s, truth-only cut 101 tasks / 2.2 s with HIGHER taskCpu — the lazy
  * default keeps the fewest tasks and lowest CPU; the wall spread is
  * stage-overhead noise.
  */
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
    @volatile var tasks = 0L
    @volatile var cpuNs = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks += 1
          if (te.taskMetrics != null) cpuNs += te.taskMetrics.executorCpuTime
        }
      })
    val strategies = Seq(
      ("nation", col("c_nationkey").cast("string")),
      ("segment", col("c_mktsegment")),
      ("name12", substring(col("c_name"), 1, 12)))
    def time(label: String)(f: => Long): Unit = {
      tasks = 0; cpuNs = 0
      val t0 = System.nanoTime()
      val n = f
      Thread.sleep(500) // let the listener bus drain
      println(f"ERPROBE $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs" +
        f"  rows=$n  tasks=$tasks  taskCpu=${cpuNs / 1e9}%7.2fs")
    }
    (1 to 2).foreach { i =>
      time(s"lazy_rep$i") {
        EntityResolution.blockingEval(cust, "c_custkey", "c_name",
          strategies).count()
      }
      time(s"cut_rep$i") {
        EntityResolution.blockingEval(cust, "c_custkey", "c_name",
          strategies, materialize = graft.engine.Materialize.local).count()
      }
    }
    spark.stop()
  }
}
