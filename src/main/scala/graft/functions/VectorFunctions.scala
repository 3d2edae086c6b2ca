package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Vector math over `Array[Float]` embedding columns, built entirely on
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * whole-stage codegen stays intact and the operators scale by partitioning
  * alone.
  *
  * Sums are accumulated in DECIMAL so results are exact and identical across
  * engines and shuffle orders (the t2 oracle requirement); the final value is
  * converted back to DOUBLE once.
  */
object VectorFunctions {

  private val ElemDec = DecimalType(18, 16) // |element product| < 100, 16 fp digits
  private val AccDec = DecimalType(38, 16)

  /** Exact dot product: per-element double multiply (identical IEEE result in
    * any engine), then decimal accumulation (order-independent).
    */
  def dotDecimal(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") * y.cast("double")).cast(ElemDec)),
      lit(0).cast(AccDec),
      (acc, v) => (acc + v).cast(AccDec))

  /** Exact squared L2 norm. */
  def normSqDecimal(a: Column): Column = dotDecimal(a, a)


  /** Cosine similarity as DOUBLE (exact decimal dot/norms, then one double
    * division — deterministic given deterministic inputs).
    */
  def cosine(a: Column, b: Column): Column =
    dotDecimal(a, b).cast("double") /
      (sqrt(normSqDecimal(a).cast("double")) * sqrt(normSqDecimal(b).cast("double")))

  /** Cosine rounded for stable cross-engine comparison/ordering. */
  def cosineRounded(a: Column, b: Column, scale: Int = 6): Column =
    round(cosine(a, b), scale)

  /** Sign-LSH bucket key: the sign bits of the first `nBits` dimensions as a
    * bit-string. Axis-aligned random-hyperplane LSH — deterministic, exactly
    * reproducible in any engine (sign of a float is exact), and at 100 TB it
    * turns brute-force O(N) scans into O(N/2^nBits) bucket probes after a
    * single shuffle on the bucket key.
    */
  def signBucket(emb: Column, nBits: Int): Column =
    array_join(
      transform(slice(emb, 1, nBits),
        x => when(x > lit(0f), lit("1")).otherwise(lit("0"))),
      "")
}
