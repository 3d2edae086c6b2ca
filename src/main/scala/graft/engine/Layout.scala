package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical data-layout operators. At 100 TB the scan is the query cost, and
  * layout is what makes scans cheap: a table clustered on a space-filling
  * curve over its two hottest filter dimensions gives every file a tight
  * min/max envelope in BOTH dimensions, so two-sided predicates prune to a
  * small file subset (the Delta/Iceberg OPTIMIZE ZORDER idea, expressed as
  * plain Spark `repartitionByRange` + `sortWithinPartitions`).
  */
object Layout {

  /** Morton (Z-order) value interleaving the low `bits` bits of two
    * non-negative integer columns: bit i of `a` lands at position 2i, bit i
    * of `b` at 2i+1. Pure shift/mask built-ins — codegen'd, map-only.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** Cluster `df` on the Z-curve over two dimension expressions (each
    * bucketized to `bits` bits by the caller): range-partition by the
    * z-value, sort within partitions. Each output partition (= file on
    * write) then covers a compact z-range, i.e. a tight rectangle in
    * (dimA, dimB) space — the property the `LayoutSpec` asserts. One range
    * shuffle, the same cost class as any global sort, paid once at write
    * time to make every later two-sided scan prune.
    */
  def zorderBy(
      df: DataFrame,
      dimA: Column,
      dimB: Column,
      bits: Int = 16,
      numPartitions: Int = 0): DataFrame = {
    val withZ = df.withColumn("z", zValue(dimA, dimB, bits))
    val ranged =
      if (numPartitions > 0) withZ.repartitionByRange(numPartitions, col("z"))
      else withZ.repartitionByRange(col("z"))
    ranged.sortWithinPartitions(col("z"))
  }
}
