package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reusable relational primitives, one per operator family in SURVEY.md §2.
  * All of them are pure DataFrame transformations: Catalyst handles predicate
  * pushdown, column pruning, and physical join selection (AQE broadcasts the
  * small side at runtime), so the same code path scales from sf0.001 to a
  * multi-executor cluster purely by partitioning.
  *
  * Composite (multi-column) keys are supported everywhere via `Seq[String]`
  * key lists, mirroring the reference's tuple syntax
  * (/root/reference/subset_utils.py:85-89).
  */
object Ops {

  /** Join `df` to the distinct key set of `target` renamed to avoid
    * name collisions; used by both semi and anti flavors.
    */
  private def keyJoin(
      df: DataFrame,
      dfKeys: Seq[String],
      target: DataFrame,
      targetKeys: Seq[String],
      joinType: String): DataFrame = {
    require(dfKeys.length == targetKeys.length, "key arity mismatch")
    val renamed = target
      .select(targetKeys.map(col): _*)
      .toDF(targetKeys.indices.map(i => s"__graft_k$i"): _*)
    val cond = dfKeys.zipWithIndex
      .map { case (k, i) => df(k) === renamed(s"__graft_k$i") }
      .reduce(_ && _)
    df.join(renamed, cond, joinType)
  }

  /** J1 — semi-join: rows of `df` whose `(fkCols)` tuple appears among
    * `(targetCols)` of `target`, i.e. the generated
    * `(fk) IN (SELECT pk FROM target)` (/root/reference/subset.py:141).
    * `===` is null-rejecting, matching SQL `IN` semantics for NULL FK tuples
    * (SURVEY.md §2.3 box).
    */
  def semiJoin(
      df: DataFrame,
      fkCols: Seq[String],
      target: DataFrame,
      targetCols: Seq[String]): DataFrame =
    keyJoin(df, fkCols, target, targetCols, "left_semi")

  /** U2/J3 — anti-join: rows of `df` whose key tuple does NOT appear in
    * `target` (`NOT IN` with the reference's explicit NULL-tuple drop,
    * /root/reference/subset.py:180,195 — callers must `na.drop` key columns
    * first; `missingIds` below does).
    */
  def antiJoin(
      df: DataFrame,
      dfKeys: Seq[String],
      target: DataFrame,
      targetCols: Seq[String]): DataFrame =
    keyJoin(df, dfKeys, target, targetCols, "left_anti")

  /** J3 — the downstream id-gathering operator: distinct non-NULL FK tuples
    * of `referencing` that are missing from `existing`. Output columns are
    * renamed to `existingKeyCols` (the target table's PK names), ready to
    * drive the fetch semi-join (/root/reference/subset.py:166-198). The
    * reference's 100k-id IN-list chunking disappears: both sides stay
    * distributed DataFrames.
    */
  def missingIds(
      referencing: DataFrame,
      fkCols: Seq[String],
      existing: DataFrame,
      existingKeyCols: Seq[String]): DataFrame = {
    val ids = referencing
      .select(fkCols.map(col): _*)
      .na.drop("any")
      .distinct()
      .toDF(existingKeyCols: _*)
    antiJoin(ids, existingKeyCols, existing, existingKeyCols)
  }

  /** P2 — NULL-substituting projection for dependency-break redaction:
    * replace each listed column with a typed NULL, preserving schema and
    * column order (/root/reference/subset_utils.py:8-21).
    */
  def nullOutColumns(df: DataFrame, colsToNull: Set[String]): DataFrame =
    if (colsToNull.isEmpty) df
    else
      df.select(df.schema.fields.map { f =>
        if (colsToNull.contains(f.name)) lit(null).cast(f.dataType).as(f.name)
        else col(f.name)
      }.toIndexedSeq: _*)

  /** P4 — Bernoulli percent sample, seeded for reproducibility
    * (reference: `WHERE random() < p/100`, /root/reference/subset.py:110-114).
    * Not oracle-verifiable (see `deterministicSample` for the t2 surface).
    */
  def percentSample(df: DataFrame, percent: Double, seed: Long): DataFrame =
    df.filter(rand(seed) < lit(percent / 100.0))

  /** P4 (deterministic variant) — key-mod sample: identical results in any
    * engine, used wherever a DuckDB oracle must hash-match (SURVEY.md §7.3).
    */
  def deterministicSample(df: DataFrame, keyCol: String, mod: Int, rem: Int = 0): DataFrame =
    df.filter(col(keyCol) % mod === rem)

  /** P4 (stratified variant) — per-stratum keep-1-in-den sampling, the
    * class-balancing shape a training-data pipeline uses (`sampleBy` with
    * deterministic key-mod predicates instead of rand, so results are
    * engine-exact). Strata absent from `dens` fall back to `defaultDen`.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      keyCol: String,
      dens: Map[String, Int],
      defaultDen: Int): DataFrame = {
    val cond = dens.toSeq.sortBy(_._1).foldRight(
      pmod(col(keyCol), lit(defaultDen)) === 0) {
      case ((stratum, den), els) =>
        when(col(stratumCol) === stratum, pmod(col(keyCol), lit(den)) === 0)
          .otherwise(els)
    }
    df.filter(cond)
  }

  /** J4 — orphan-FK scrub: NULL out FK cells whose target row is absent
    * (UPDATE … WHERE NOT EXISTS,
    * /root/reference/psql_database_helper.py:85-94). Implemented as a single
    * left-outer join + conditional projection, no mutation.
    */
  def orphanScrub(
      df: DataFrame,
      fkCols: Seq[String],
      target: DataFrame,
      targetCols: Seq[String]): DataFrame = {
    val marker = "__graft_present"
    val keys = target
      .select(targetCols.map(col): _*)
      .distinct()
      .toDF(targetCols.indices.map(i => s"__graft_k$i"): _*)
      .withColumn(marker, lit(true))
    val cond = fkCols.zipWithIndex
      .map { case (k, i) => df(k) === keys(s"__graft_k$i") }
      .reduce(_ && _)
    val joined = df.join(keys, cond, "left_outer")
    joined.select(df.schema.fieldNames.map { n =>
      if (fkCols.contains(n))
        when(col(marker), col(n)).otherwise(lit(null).cast(df.schema(n).dataType)).as(n)
      else col(n)
    }.toIndexedSeq: _*)
  }

  /** L1 — optional row cap (`max_rows_per_table` LIMIT,
    * /root/reference/subset.py:75-76,145-146).
    */
  def limitCap(df: DataFrame, maxRows: Option[Long]): DataFrame =
    maxRows.fold(df)(n => df.limit(math.min(n, Int.MaxValue.toLong).toInt))

  /** U1 — accumulate phase outputs into one table, deduplicating on the PK
    * where phases can overlap (SURVEY.md §7.3 item 5).
    */
  def unionDedup(a: DataFrame, b: DataFrame, pkCols: Seq[String]): DataFrame =
    a.unionByName(b).dropDuplicates(pkCols)

  /** As-of join: for every left row, attach the payload of the latest right
    * row with `rightTs <= leftTs` within the same key group (DuckDB/kdb
    * `ASOF JOIN` semantics, left-outer flavor).
    *
    * Spark has no native as-of join; rather than a custom SparkPlan this is
    * the composition built-ins admit: tag and union both sides, then a
    * single carry-forward window (`last(..., ignoreNulls)` over the
    * ts-ordered union) per key. One shuffle on the key — the same cost as
    * the sort-merge join a native implementation would do, and it inherits
    * AQE/skew handling for free.
    *
    * @param tieBreak extra right-side ordering columns so equal-timestamp
    *                 right rows resolve deterministically (last wins).
    * @param direction "backward" (default, `rightTs <= leftTs`, latest
    *                  wins — DuckDB/kdb/pandas default) or "forward"
    *                  (`rightTs >= leftTs`, earliest wins — pandas
    *                  `merge_asof(direction="forward")`): the same
    *                  one-shuffle carry-forward plan over the reversed
    *                  timestamp order.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      payload: Seq[String],
      tieBreak: Seq[String] = Nil,
      direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(direction == "backward" || direction == "forward",
      s"asofJoin direction must be backward or forward, got $direction")
    val fwd = direction == "forward"
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__graft_ts")) ++
        payload.map(c => col(c).as(s"asof_$c")) ++
        tieBreak.map(c => col(c).as(s"__graft_tb_$c")): _*)
      .withColumn("__graft_src", lit(0))
    val l = left
      .withColumn("__graft_ts", col(leftTs))
      .withColumn("__graft_src", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    def dir(c: Column): Column = if (fwd) c.desc else c.asc
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((Seq(dir(col("__graft_ts")), col("__graft_src").asc) ++
        tieBreak.map(c => dir(col(s"__graft_tb_$c")))): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    val cleaned = tieBreak.foldLeft(
      carried.filter(col("__graft_src") === 1)
        .drop("__graft_ts", "__graft_src"))((df, c) => df.drop(s"__graft_tb_$c"))
    cleaned
  }

  /** Range (interval) join: pair every point row with every interval row
    * whose `[startCol, endCol]` contains the point — the IP-range-lookup /
    * sensor-window / incident-correlation shape.
    *
    * Spark plans a bare `p.ts BETWEEN i.lo AND i.hi` join as
    * BroadcastNestedLoopJoin (or worse, a cartesian product when neither
    * side broadcasts) — O(points × intervals) comparisons. This is the
    * standard bin-bucketed rewrite: bucket the time axis at `binWidth`,
    * give each POINT its single bucket, EXPLODE each interval across the
    * buckets it overlaps, and equi-join on the bucket before applying the
    * exact containment predicate. The join is then a plain hash/sort-merge
    * shuffle on the bucket id — AQE, skew splitting and partial pushdown
    * all apply. Each qualifying (point, interval) pair is produced EXACTLY
    * once because a point owns exactly one bucket — no dedup pass.
    *
    * Scale shape: interval replication = ceil(span / binWidth) + 1 rows,
    * so pick `binWidth` near the TYPICAL interval span (replication ≤2×);
    * shuffle volume is points + replicated intervals, never their product.
    * Hot buckets (a time spike) are ordinary equi-join skew — AQE's skew
    * split or [[saltedJoin]] composes on top. Cites Flink's interval join
    * and DuckDB's IEJoin as the reference semantics.
    *
    * @param pointCol  numeric/long point column on `points`
    * @param startCol/endCol  inclusive interval bounds on `intervals`
    */
  def rangeJoinBinned(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"rangeJoinBinned: binWidth must be positive, got $binWidth")
    val p = points.withColumn("__graft_bin",
      floor(col(pointCol) / binWidth).cast("long"))
    val iv = intervals.withColumn("__graft_bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    p.join(iv, Seq("__graft_bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__graft_bin")
  }

  /** Skew-resistant equi-join: split each hot key of the big side across
    * `saltN` sub-partitions (seeded, reproducible salt) and replicate the
    * small side once per salt value. Use when one key holds a large share of
    * the rows and AQE's skew handling isn't available/sufficient — the salt
    * bounds any single task at ~1/saltN of the hot key.
    *
    * The salt is a pure hash of the whole big-side row plus the seed — never
    * `rand(seed)`, whose value depends on the partition layout and so can
    * differ under task retry after a nondeterministic upstream shuffle,
    * silently duplicating or dropping rows. A hash salt is bit-stable across
    * retries and re-runs.
    */
  def saltedJoin(
      big: DataFrame,
      bigKeys: Seq[String],
      small: DataFrame,
      smallKeys: Seq[String],
      saltN: Int,
      seed: Long = 42L): DataFrame = {
    val salted = big.withColumn("__graft_salt",
      pmod(hash(big.columns.map(col) :+ lit(seed): _*), lit(saltN)))
    val replicated = small
      .withColumn("__graft_salt", explode(sequence(lit(0), lit(saltN - 1))))
    val cond = bigKeys.zip(smallKeys)
      .map { case (bk, sk) => salted(bk) === replicated(sk) }
      .reduce(_ && _) && salted("__graft_salt") === replicated("__graft_salt")
    val joined = salted.join(replicated, cond, "inner")
    // keep keys once (big side) and drop the salt plumbing
    smallKeys.foldLeft(joined)((df, k) => df.drop(replicated(k)))
      .drop(salted("__graft_salt"))
      .drop(replicated("__graft_salt"))
  }

  /** Bloom-filter runtime prefilter ahead of a semi-join — the pattern
    * that makes "join 100 TB of facts to a selectively-filtered dimension"
    * cheap: build an `mBits`-bit Bloom filter over the dim keys (a few KiB,
    * independent of fact size), push its membership test into the fact
    * SCAN as a codegen'd filter, and only then run the exact semi-join on
    * the survivors. False positives are removed by the join, so the result
    * is EXACTLY the plain semi-join (the oracle states it as one); what
    * the Bloom buys is shuffle volume — at a 1% selective dim predicate,
    * ~99% of fact rows die map-side instead of crossing the network.
    * Spark's own runtime row-group filtering targets the same win; this
    * operator makes it explicit, tunable, and independent of AQE.
    *
    * Build is distributed: each dim key explodes to `numHashes` bit
    * positions (seeded `xxhash64`), positions dedup, OR into 64-bit words,
    * and only the word table — ≤ `mBits`/64 rows, bounded by the CONFIG,
    * not the data — is collected and re-broadcast as one array literal
    * inside the filter expression (whole-stage codegen'd: element_at +
    * shift + mask, no UDF). Size `mBits` ~10× the expected dim key count
    * for a ~1-2% false-positive rate at 3 hashes.
    */
  def bloomPrefilterSemiJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      mBits: Int = 1 << 16,
      numHashes: Int = 3): DataFrame = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
    // seeds are LONG literals on both the build and probe side — xxhash64
    // hashes int and long inputs differently, so the types must match
    val posList = (0 until numHashes)
      .map(i => pmod(xxhash64(col(dimKey), lit(i.toLong)), lit(mBits.toLong)))
    val wordRows = dim
      .select(explode(array(posList: _*)).as("p")).distinct()
      .select(expr("CAST(p div 64 AS INT)").as("w"),
        expr("shiftleft(1L, CAST(p % 64 AS INT))").as("b"))
      .groupBy(col("w")).agg(bit_or(col("b")).as("word"))
      .collect() // bounded: ≤ mBits/64 rows regardless of data size
    val words = new Array[Long](mBits / 64)
    wordRows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    val test = (0 until numHashes).map { i =>
      val p = s"pmod(xxhash64($factKey, ${i}L), ${mBits}L)"
      expr(s"((element_at(__graft_bf, CAST($p div 64 AS INT) + 1) " +
        s">> CAST($p % 64 AS INT)) & 1) = 1")
    }.reduce(_ && _)
    val prefiltered = fact
      .withColumn("__graft_bf", typedlit(words.toSeq))
      .filter(test)
      .drop("__graft_bf")
    semiJoin(prefiltered, Seq(factKey), dim, Seq(dimKey))
  }

  /** SQL NTILE(k) over a global (sortKey, tieKey) order WITHOUT a
    * single-partition global window: rows bucket by which of the
    * `boundsPow2` exact-quantile boundaries they fall under (power-of-two
    * fractions interpolate to exact binary doubles — the cross-engine-safe
    * percentile class), each range ranks independently under a
    * range-partitioned window, broadcast range offsets lift the local
    * ranks to the global rank, and the global rank maps to the NTILE
    * bucket by the exact SQL remainder rule (the first n mod k buckets
    * take ceil(n/k) rows). Same distributed two-phase-rank shape as
    * `Curation.curriculumOrder`. Returns the input plus `ntile_bucket`.
    *
    * `sortKey` must be integral (boundary comparison is `<=` on exact
    * values); ties beyond (sortKey, tieKey) must not exist (tieKey
    * unique), which keeps both engines' total order identical.
    */
  def ntileBuckets(
      df: DataFrame, sortKey: String, tieKey: String, k: Int,
      boundsPow2: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, "ntileBuckets: k >= 1")
    require(boundsPow2 >= 2 && (boundsPow2 & (boundsPow2 - 1)) == 0,
      "ntileBuckets: boundsPow2 must be a power of two")
    val qs = (1 until boundsPow2).map(i => i.toDouble / boundsPow2)
    val bounds = df.agg(
      expr(s"percentile($sortKey, array(${qs.mkString(", ")}))").as("bs"))
    val rangeId = (1 until boundsPow2)
      .map(i => when(col(sortKey) >= element_at(col("bs"), i), 1).otherwise(0))
      .reduce(_ + _)
    val ranged = df.crossJoin(broadcast(bounds))
      .withColumn("__rg", rangeId.cast("int")).drop("bs")
    val wOff = Window.orderBy(col("__rg"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // boundsPow2-row relation: cumulate into global range offsets
    val offsets = ranged.groupBy(col("__rg")).agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("__rg"), col("__off"))
    val nTotal = df.agg(count(lit(1)).as("__nt"))
    val wIn = Window.partitionBy(col("__rg"))
      .orderBy(col(sortKey), col(tieKey))
    ranged.join(broadcast(offsets), Seq("__rg"))
      .withColumn("__rank", col("__off") + row_number().over(wIn))
      .crossJoin(broadcast(nTotal))
      // SQL NTILE: with q = n div k, r = n mod k, the first r buckets hold
      // q+1 rows — rank <= r*(q+1) lands in bucket (rank+q) div (q+1),
      // the rest offset into the q-sized tail buckets
      .withColumn("__q", expr(s"__nt div ${k}L"))
      .withColumn("__r", expr(s"__nt % ${k}L"))
      .withColumn("ntile_bucket", expr(
        "CAST(IF(__rank <= __r * (__q + 1), " +
          "(__rank + __q) div (__q + 1), " +
          // divisor guarded inline (house ANSI rule): the else branch is
          // unreachable when __q = 0 (every rank <= __r then), but the
          // guard keeps the expression total either way
          "__r + (__rank - __r * (__q + 1) + __q - 1) div IF(__q = 0, 1, __q)) AS INT)"))
      .drop("__rg", "__off", "__rank", "__nt", "__q", "__r")
  }
}
