package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev probe for the quality_perplexity_buckets CPU-signature mystery
  * (VERDICT r15 #2): same key, same 80 tasks, taskCpu 6.5-98 s across six
  * committed bench runs of identical code — the two >=28 s readings are
  * exactly the two runs with >=7.3 GB heap occupancy at key time. This
  * probe reproduces the mechanism: N reps on a clean heap, then N reps
  * with several GB of live localCheckpoint ballast pinned (the state a
  * 364-key bench session accumulates), comparing taskCpu.
  */
object QpProbe {
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
    @volatile var cpuNs = 0L
    @volatile var gcMs = 0L
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (te.taskMetrics != null) {
            cpuNs += te.taskMetrics.executorCpuTime
            gcMs += te.taskMetrics.jvmGCTime
          }
      })
    spark.read.parquet(s"$dir/region.parquet").count()
    def heapMB: Long = {
      val h = java.lang.management.ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
      h.getUsed / (1024 * 1024)
    }
    def rep(tag: String): Unit = (1 to 3).foreach { i =>
      cpuNs = 0; gcMs = 0
      val t0 = System.nanoTime()
      val n = SparkEntry.queries("quality_perplexity_buckets")(spark, dir).count()
      Thread.sleep(400)
      println(f"QPPROBE $tag rep$i wall=${(System.nanoTime() - t0) / 1e9}%6.2fs " +
        f"taskCpu=${cpuNs / 1e9}%6.2fs taskGc=${gcMs / 1000.0}%5.2fs " +
        f"heapMB=$heapMB rows=$n")
    }
    rep("clean  ")
    System.gc()
    println(s"QPPROBE explicit System.gc() done: heapMB=$heapMB")
    rep("postgc ")
    // ballast: live checkpointed blocks, the state a long bench session
    // holds (localCheckpoint storage is unevictable while referenced)
    val ballast = (1 to 6).map { i =>
      val b = spark.range(0L, 12L * 1000 * 1000, 1L, 32)
        .selectExpr("id", "md5(CAST(id AS STRING)) AS a",
          "md5(CAST(id + 1 AS STRING)) AS b", "md5(CAST(id + 2 AS STRING)) AS c")
        .localCheckpoint()
      b.count()
      b
    }
    println(s"QPPROBE ballast pinned: heapMB=$heapMB blocks=${ballast.size}")
    rep("loaded ")
    spark.stop()
  }
}
