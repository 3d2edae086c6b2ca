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

  /** Hilbert-curve index of a 2-D point (the xy2d walk of the classic
    * iterative algorithm): unlike the Z-curve, the Hilbert curve never
    * long-jumps, so consecutive curve positions are always grid
    * neighbors — tighter per-file envelopes for the same sort, the reason
    * warehouse OPTIMIZE implementations offer it next to Z-order.
    * One native codegen'd expression
    * ([[graft.functions.NativeExpressions.HilbertPos]]) evaluating the
    * constant-size bit-level loop — analysis cost is a single expression
    * node regardless of `bits` (the former unrolled Column tree grew
    * ~5^bits nodes and cost ~5 s of driver analysis at bits = 6), so the
    * usable resolution matches [[zValue]]'s 16 and beyond.
    */
  def hilbertValue(xCol: Column, yCol: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31,
      s"hilbertValue: bits must be in 1..31, got $bits")
    org.apache.spark.sql.graft.PlanBuilder.columnOf(
      graft.functions.NativeExpressions.HilbertPos(
        org.apache.spark.sql.graft.PlanBuilder.expressionOf(xCol.cast("long")),
        org.apache.spark.sql.graft.PlanBuilder.expressionOf(yCol.cast("long")),
        org.apache.spark.sql.catalyst.expressions.Literal(bits)))
  }

  /** Range-partitioner balance audit — the explicit form of what Spark's
    * `repartitionByRange`/TeraSort does internally: k−1 exact quantile
    * boundaries split the value domain into k ranges of near-equal row
    * count, the precondition for a balanced global sort or range-bucketed
    * layout at 100 TB (a skewed boundary set means one straggler partition
    * sorts half the data). The boundary aggregate broadcasts one row; the
    * range id is an unrolled codegen'd comparison sum (no HOF lambda in
    * the per-row path); output is the per-range row count a layout job
    * would assert on before committing the write.
    */
  def rangePartitionBalance(df: DataFrame, valueCol: String, k: Int = 8)
      : DataFrame = {
    require(k >= 2 && (k & (k - 1)) == 0,
      "k must be a power of two so the quantile fractions are exact binary" +
        " doubles in every engine")
    val qs = (1 until k).map(i => i.toDouble / k)
    val bounds = df.agg(
      expr(s"percentile($valueCol, array(${qs.mkString(", ")}))").as("bs"))
    val rangeId = (1 until k)
      .map(i => when(col("v") >= element_at(col("bs"), i), 1).otherwise(0))
      .reduce(_ + _)
    df.select(col(valueCol).as("v"))
      .crossJoin(broadcast(bounds))
      .select(rangeId.cast("long").as("range_id"))
      .groupBy(col("range_id")).agg(count(lit(1)).as("n_rows"))
  }
}
