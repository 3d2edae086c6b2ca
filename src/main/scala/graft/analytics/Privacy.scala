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

  /** t-closeness (Li, Li & Venkatasubramanian, ICDE 2007): per QI group,
    * the Earth Mover's Distance between the group's distribution over an
    * ORDERED sensitive attribute (pre-binned to `nBins` integer bins
    * 0..nBins-1) and the global distribution. For ordered 1-D histograms
    * EMD is the mean absolute cumulative-share gap,
    * EMD = Σ_j |cumshare_g(j) − cumshare_G(j)| / (nBins − 1), computed
    * here without division as the integer cross-multiplication
    * |cum_g(j)·N − cum_G(j)·n_g| summed in DECIMAL(38,0) and emitted in
    * exact basis points. The group×bin grid (groups × nBins rows,
    * missing bins as real zeros) is what cumulates — every window is
    * nBins rows per group, never table-sized. Flags groups with
    * EMD > t (the attribute-disclosure gap l-diversity misses: a group
    * can have many DISTINCT sensitive values that are all clustered at
    * the top of the range).
    */
  /** Mondrian multidimensional k-anonymous partitioning (LeFevre, DeWitt
    * & Ramakrishnan, "Mondrian multidimensional k-anonymity", ICDE 2006)
    * with the recursion UNROLLED to three median cuts (numeric →
    * categorical-as-ordinal → numeric), the `token_graph_kcore` unrolling
    * pattern: each level computes its regions' medians in one
    * partial-aggregating groupBy (regions-sized, broadcast back), so the
    * whole partitioner is three scans regardless of table size — the
    * data-adaptive alternative to [[generalizationLadder]]'s fixed
    * coarsening grid. Median comparisons are the doubled-integer form
    * (x·2 > 2·median, integral at .5 interpolation — the
    * cross-engine-safe class). Emits one row per leaf region: its
    * recursive path bits, population, numeric range, distinct
    * categorical values, and the k-anonymity verdict at `k`.
    */
  def mondrianPartitions(df: DataFrame, numCol: Column, catCol: Column,
      k: Long = 25L): DataFrame = {
    def med2(c: String): Column =
      expr(s"CAST(round(2 * percentile($c, 0.5), 0) AS BIGINT)")
    val base = df.select(numCol.cast("long").as("x"), catCol.cast("long").as("y"))
    val m1 = base.agg(med2("x").as("mx2"))
    val r1 = base.crossJoin(broadcast(m1))
      .withColumn("r1", (col("x") * 2 > col("mx2")).cast("int"))
    val m2 = r1.groupBy(col("r1")).agg(med2("y").as("my2"))
    val r2 = r1.join(broadcast(m2), Seq("r1"))
      .withColumn("r2", (col("y") * 2 > col("my2")).cast("int"))
    val m3 = r2.groupBy(col("r1"), col("r2")).agg(med2("x").as("mx2b"))
    r2.join(broadcast(m3), Seq("r1", "r2"))
      .withColumn("r3", (col("x") * 2 > col("mx2b")).cast("int"))
      .groupBy(col("r1"), col("r2"), col("r3"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        countDistinct(col("y")).as("n_cat"))
      .withColumn("kanon", (col("n") >= k).cast("int"))
  }

  def tClosenessReport(
      df: DataFrame, qi: Column, bin: Column, nBins: Int,
      tBp: Long = 2000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBins >= 2, "tClosenessReport: nBins >= 2")
    val binned = df.select(qi.as("qi_group"), bin.as("bin"))
    val cell = binned.groupBy(col("qi_group"), col("bin"))
      .agg(count(lit(1)).as("c"))
    // dense group×bin grid: every group must carry all nBins cumulative
    // steps (a group missing the low bins is exactly the leak t-closeness
    // measures). Groups relation is QI-domain-sized — broadcast.
    val groups = cell.groupBy(col("qi_group")).agg(sum(col("c")).as("n_g"))
    val bins = binned.sparkSession.range(0, nBins)
      .select(col("id").cast("int").as("bin"))
    val grid = groups
      .crossJoin(broadcast(bins))
      .join(cell, Seq("qi_group", "bin"), "left")
      .na.fill(0L, Seq("c"))
    val n = binned.agg(count(lit(1)).as("n_all"))
    val wG = Window.partitionBy(col("qi_group")).orderBy(col("bin"))
    val wAll = Window.orderBy(col("bin")) // nBins rows — bounded
    // globally-empty bins must still carry a cumulative step (their
    // |cum_g·N − cum_all·n_g| term is generally nonzero), so the global
    // cumulation runs over the DENSE bin range too
    val gCum = bins
      .join(binned.groupBy(col("bin")).agg(count(lit(1)).as("cg")),
        Seq("bin"), "left")
      .na.fill(0L, Seq("cg"))
      .select(col("bin"), sum(col("cg")).over(wAll).as("cum_all"))
    grid
      .withColumn("cum_g", sum(col("c")).over(wG))
      .join(broadcast(gCum), Seq("bin"))
      .crossJoin(broadcast(n))
      .groupBy(col("qi_group"))
      .agg(
        first(col("n_g")).as("n"),
        sum(abs(col("cum_g").cast("decimal(38,0)") * col("n_all") -
          col("cum_all").cast("decimal(38,0)") * col("n_g"))).as("sad"),
        first(col("n_all")).as("n_all"))
      .select(col("qi_group"), col("n").as("n"),
        expr(s"CAST((10000 * sad) div (CAST(n AS DECIMAL(38,0)) * n_all * ${nBins - 1}) AS BIGINT)")
          .as("emd_bp"))
      .withColumn("t_violation", (col("emd_bp") > tBp).cast("int"))
  }

  /** Differentially-private count release via the GEOMETRIC mechanism —
    * the discrete Laplace (Ghosh, Roughgarden & Sundararajan 2009) at
    * ε = ln 2 (α = 1/2, so P(0) = 1/3 and each further step halves),
    * which keeps the whole inverse CDF inside FROZEN integer literals:
    * the draw u = first 6 md5 hex digits of "dp-<pepper>:<key>" in
    * [0, 16⁶) ladders through the cumulative thresholds for outcomes
    * 0, +1, −1, …, ±4 in 16⁶ths (the Poisson-bootstrap discipline —
    * the one transcendental, ln 2, never appears at runtime), a draw
    * past the last threshold clamps to +5 (tail mass 1/24, stated).
    * Deterministic noise is exactly what a DP pipeline's commissioning
    * harness wants: the release replays bit-for-bit in any engine, and
    * the true count ships NEXT TO the noisy one because this is the
    * calibration view, not the public release. Released counts floor
    * at 0 (post-processing preserves DP). One group-keyed aggregate;
    * noise is a map-side expression.
    */
  def dpGeometricCounts(df: DataFrame, keyCol: String,
      pepper: String = "r16"): DataFrame = {
    val thresholds = Seq(5592405L -> 0L, 8388608L -> 1L, 11184810L -> -1L,
      12582912L -> 2L, 13981013L -> -2L, 14680064L -> 3L,
      15379114L -> -3L, 15728640L -> 4L, 16078165L -> -4L)
    val ladder = thresholds.foldRight(lit(5L): Column) { case ((t, k), rest) =>
      when(col("u") < t, k).otherwise(rest)
    }
    df.groupBy(col(keyCol).as("group_key"))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("u", expr(
        s"CAST(conv(substring(md5(concat('dp-$pepper:', " +
          "CAST(group_key AS STRING))), 1, 6), 16, 10) AS BIGINT)"))
      .withColumn("k_noise", ladder)
      .select(col("group_key"), col("n_true"), col("u"), col("k_noise"),
        greatest(lit(0L), col("n_true") + col("k_noise")).as("n_released"))
  }
}
