package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy QA + de-identification operators — the analytics companion of
  * the subsetter (the reference product's domain is privacy-safe test
  * data; see `/root/reference/README.md`): before a subset ships outside
  * production, a pipeline measures re-identification risk (k-anonymity,
  * l-diversity over quasi-identifier combinations) and applies
  * referentially-consistent de-identification (deterministic peppered
  * tokenization, so foreign keys keep joining after masking — the
  * property `Ops.nullOutColumns`-style redaction destroys). All outputs
  * are exact integer counts / md5 tokens, oracle-hashable.
  */
object Privacy {

  /** k-anonymity risk table: one row per quasi-identifier combination with
    * its group size `k` and a below-threshold flag. A row whose QI group
    * has k = 1 is uniquely re-identifiable by those attributes; releases
    * usually require min(k) ≥ 5. One partial-aggregating groupBy on the
    * QI columns; output is bounded by the QI domain product, not the
    * table.
    */
  def kAnonymityReport(df: DataFrame, qi: Seq[Column], threshold: Long = 5L)
      : DataFrame =
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("k"))
      .withColumn("below", (col("k") < threshold).cast("int"))

  /** Generalization ladder: the fine QI grouping joined to the coarse one
    * (same QI with one attribute generalized), so each fine group carries
    * `k_fine` and the `k_coarse` it would merge into — the measurement
    * behind "generalize until k ≥ threshold". `k_coarse ≥ k_fine` always
    * (coarse groups are unions of fine ones); the spec pins it.
    */
  def generalizationLadder(
      df: DataFrame,
      stableQi: Seq[Column],
      fine: Column,
      coarse: Column): DataFrame = {
    val names = stableQi.indices.map(i => s"qi$i")
    val base = df.select(
      stableQi.zip(names).map { case (c, n) => c.as(n) } ++
        Seq(fine.as("band_fine"), coarse.as("band_coarse")): _*)
    val fineK = base.groupBy(names.map(col) :+ col("band_fine")
        :+ col("band_coarse"): _*)
      .agg(count(lit(1)).as("k_fine"))
    val coarseK = base.groupBy(names.map(col) :+ col("band_coarse"): _*)
      .agg(count(lit(1)).as("k_coarse"))
    fineK.join(coarseK, names :+ "band_coarse")
      .select(names.map(col) :+ col("band_fine") :+ col("k_fine")
        :+ col("k_coarse"): _*)
  }

  /** l-diversity: per QI group, the number of DISTINCT sensitive values —
    * a k-anonymous group whose sensitive attribute is constant still
    * leaks it (the homogeneity attack k-anonymity misses; Machanavajjhala
    * et al., "l-diversity", ICDE 2006). Flags groups below `minL`.
    */
  def lDiversityReport(
      df: DataFrame,
      qi: Seq[Column],
      sensitive: Column,
      minL: Long = 2L): DataFrame =
    df.groupBy(qi: _*)
      .agg(count(lit(1)).as("k"),
        countDistinct(sensitive).as("l"))
      .withColumn("low_diversity", (col("l") < minL).cast("int"))

  /** Deterministic peppered pseudonymization: a stable md5-derived token
    * per id. The SAME pepper applied to a foreign-key column yields the
    * same token — referential integrity survives de-identification
    * (`PrivacySpec` proves the orders→customer join is orphan-free after
    * masking), which is the property that separates pseudonymization from
    * redaction. Map-only; reversing requires the pepper (keep it out of
    * the released data).
    */
  def pseudonym(id: Column, pepper: String, prefix: String): Column =
    concat(lit(prefix),
      substring(md5(concat(lit(pepper + "-"), id.cast("string"))
        .cast("binary")), 1, 12))
}
