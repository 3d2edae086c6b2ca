package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Time individual query keys in isolation (dev tool):
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.Solo key [key…]
  * Repeats each key `SPARK_GRAFT_REPS` times (default 1) after one warm-up
  * pass over region/nation so JIT noise doesn't drown the signal.
  */
object Solo {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "1").toInt
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      // CPU-bound analytic kernels (simhash/jaccard/minhash joins) are
      // tiny in BYTES but heavy per row; the default 1MB AQE coalesce
      // floor serializes them onto a handful of cores (measured 3x on
      // simhash_neardup_pairs_wide at sf0.1/local[32]). 64k keeps AQE's
      // empty-partition cleanup while letting parallelism win.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.shuffle.sort.bypassMergeThreshold", "0")
      .config("spark.ui.enabled", "false")
    // A/B experiment hook: SPARK_GRAFT_CONF="key=value;key=value"
    ConfHook(builder)
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // task CPU is the host-noise-robust reading (wall swings 2x with
    // hypervisor steal; CPU doesn't) — accumulate it per rep
    val cpu = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null)
            cpu.addAndGet(e.taskMetrics.executorCpuTime / 1000000)
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          jobs.incrementAndGet()
      })
    spark.read.parquet(s"$dir/region.parquet").groupBy("r_name").count().count()
    args.foreach { name =>
      (1 to reps).foreach { i =>
        cpu.set(0L); jobs.set(0L)
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"SOLO $name%-32s rep$i $wall%7.2fs cpu=${cpu.get / 1000.0}%7.2fs " +
          f"jobs=${jobs.get}%3d rows=$n")
      }
    }
    spark.stop()
  }
}
