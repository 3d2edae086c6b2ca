package graft.analytics

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora, from exact to
  * near-duplicate. Everything is expressed as shuffle-on-key DataFrame
  * transforms: at 100 TB the only data movement is the groupBy/join shuffles
  * on hash keys, never a driver round-trip, and every hash is md5-based so
  * results are engine- and partitioning-independent.
  */
object Dedup {

  /** Exact dedup via hash-groupBy on the raw text: one representative
    * (min id) per group plus the duplicate count.
    */
  def exactGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Exact dedup on the normalized-content fingerprint — catches
    * case/whitespace variants that raw-text grouping misses.
    */
  def fingerprintGroups(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Apply the fingerprint dedup: keep exactly one representative document
    * (min id) per normalized-content group — the materialization step a
    * pipeline runs after detection. Served by the grouped top-k operator
    * with k=1 on the fingerprint: ONE scan and ONE shuffle (an
    * aggregate-then-semi-join formulation scans the corpus twice).
    */
  def dedupApply(docs: DataFrame): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
      docs.withColumn("__fp", fingerprint(col("text"))),
      Seq("__fp"), Seq("doc_id"), 1)
      .drop("__fp")

  /** Incremental (cross-snapshot) dedup — the nightly-ingest shape: which
    * rows of `newBatch` are worth admitting into a corpus that already
    * contains `corpus`. A new document survives iff (a) it is the min-id
    * representative of its normalized fingerprint WITHIN the batch and
    * (b) its fingerprint is absent from the corpus. Both sides reduce to
    * one md5 per distinct document before the anti-join, so at 100 TB the
    * shuffle carries fingerprints, never text — and on a real deployment
    * the corpus side is a pre-computed fingerprint table, making the
    * nightly cost O(batch), not O(corpus).
    */
  def incrementalNew(corpus: DataFrame, newBatch: DataFrame): DataFrame = {
    val reps = newBatch
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
    val seen = corpus.select(fingerprint(col("text")).as("fp")).distinct()
    reps.join(seen, Seq("fp"), "left_anti")
      .select(col("doc_id"), col("fp"))
  }

  /** Distinct word-`n`-gram shingles per document: (doc_id, s). The base
    * relation for Jaccard and MinHash.
    *
    * The token array is bound to a column first: inlining `split()` into the
    * shingle generator would re-split the text for every `element_at`
    * reference (~3x tokens per shingle) — measured 4x slower.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      // fixture tables are single-row-group files (one scan task); spread
      // rows before the explode so shingle generation parallelizes
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(wordShingles(col("w"), n)).as("s"))
      .distinct()

  /** N-gram Jaccard near-duplicate pairs, exact over the df-capped shingle
    * sets: |A∩B| via shingle self-join, |A∪B| = |A|+|B|−|A∩B|, thresholded
    * with integer cross-multiplication (`thresholdDen * inter >= union` ⇔
    * Jaccard ≥ 1/thresholdDen) so no floating point is involved.
    *
    * The self-join shuffles on the shingle string — the standard
    * candidate-generation shuffle. `dfCap` is the scale guard: a
    * stop-shingle ("of the and") present in ~every document would put O(n²)
    * pairs on ONE join key, so shingles with document frequency > dfCap are
    * dropped before the join (standard practice — such shingles carry no
    * near-dup signal). Sizes and intersections are both computed over the
    * surviving shingles, so the Jaccard is exact on that universe.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      n: Int = 3,
      thresholdDen: Int = 5,
      dfCap: Int = 100,
      materialize: DataFrame => DataFrame = graft.engine.Materialize.local): DataFrame = {
    // the shingle relation feeds the df filter, the size aggregate and both
    // join sides — materialize once instead of recomputing explode+distinct
    // (pass Materialize.parquet(dir) on a real cluster: localCheckpoint
    // blocks don't survive executor loss)
    val shAll = materialize(shingles(docs, n))
    // df filter shuffles on the same key as the self-join below, so the
    // capped relation arrives pre-clustered for it
    val rare = shAll.groupBy(col("s"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= dfCap)
      .select(col("s"))
    // the USING-join puts the key column first — restore (doc_id, s) order
    // for the positional renames below
    val sh = shAll.join(rare, Seq("s"), "left_semi")
      .select(col("doc_id"), col("s"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val a = sh.toDF("id_a", "s")
    val b = sh.toDF("id_b", "s")
    val inter = a.join(b, a("s") === b("s") && a("id_a") < b("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.toDF("id_a", "sz_a"), "id_a")
      .join(sizes.toDF("id_b", "sz_b"), "id_b")
      .select(col("id_a"), col("id_b"), col("n_common"),
        (col("sz_a") + col("sz_b") - col("n_common")).as("n_union"))
      .filter(lit(thresholdDen) * col("n_common") >= col("n_union"))
  }

  /** Modulus for the affine MinHash family: 2^40 keeps every intermediate
    * (h1 + 7·h2 < 2^43) inside BIGINT range in any engine.
    */
  val MinHashMod: Long = 1L << 40

  /** MinHash signatures via the standard affine (Carter-Wegman) family:
    * one md5 per shingle yields two 40-bit base hashes h1/h2, and hash
    * function j is `g_j = (h1 + j*h2) mod 2^40`. One wide groupBy computes
    * all `numHashes` minima at once — no per-seed row explosion, and md5
    * keeps the result bit-identical across engines and partitionings.
    * Output: (doc_id, m0..m{numHashes-1}).
    */
  def minHashSignatures(docs: DataFrame, numHashes: Int = 8, n: Int = 3): DataFrame = {
    // Exploded + hash-groupBy formulation on purpose: the md5-per-shingle
    // inner loop stays inside whole-stage codegen this way. (A map-only
    // higher-order-function variant was measured 4x slower — HOF lambdas
    // evaluate interpreted, which dominates for hash-heavy inner loops.)
    // No DISTINCT before hashing: min over duplicate shingles equals min
    // over the distinct set, so the dedup shuffle is pure waste here.
    val withH = docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), explode(wordShingles(col("w"), n)).as("s"))
      .withColumn("hh", md5Hex(col("s")))
      .select(col("doc_id"),
        expr("CAST(conv(substring(hh, 1, 10), 16, 10) AS BIGINT)").as("h1"),
        expr("CAST(conv(substring(hh, 11, 10), 16, 10) AS BIGINT)").as("h2"))
    val mins = (0 until numHashes).map(j =>
      min((col("h1") + lit(j.toLong) * col("h2")) % MinHashMod).as(s"m$j"))
    withH.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding over MinHash signatures: hash each band of `rowsPerBand`
    * consecutive minhashes to a bucket key. Output: (doc_id, band, bkey).
    */
  def lshBands(docs: DataFrame, numHashes: Int = 8, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    val sig = minHashSignatures(docs, numHashes, n)
    val nBands = numHashes / rowsPerBand
    val bandStructs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        md5Hex(concat_ws(",",
          (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*)).as("bkey"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /** MinHash+LSH candidate pairs: documents sharing at least one band
    * bucket, with the number of shared bands. The bucket join shuffles on
    * (band, bkey) — the LSH scale path: candidates ≪ all-pairs.
    */
  def lshCandidatePairs(
      docs: DataFrame,
      numHashes: Int = 8,
      rowsPerBand: Int = 4,
      n: Int = 3,
      materialize: DataFrame => DataFrame = graft.engine.Materialize.local): DataFrame = {
    // both sides of the bucket self-join share this pipeline — materialize once
    val bands = materialize(lshBands(docs, numHashes, rowsPerBand, n))
    val a = bands.toDF("id_a", "band", "bkey")
    val b = bands.toDF("id_b", "band", "bkey")
    a.join(b, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("band")).distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** Winnowing document fingerprints (the MOSS rolling-hash scheme): hash
    * every character `k`-gram with a polynomial hash mod 2^40, then keep the
    * minimum of each sliding window of `window` consecutive hashes. The
    * distinct minima are the document's fingerprint set — two documents
    * sharing text runs ≥ window+k-1 chars are guaranteed to share a
    * fingerprint. Integer-only math, identical in any engine.
    */
  def winnowFingerprints(
      docs: DataFrame, k: Int = 8, window: Int = 16, base: Long = 131L): DataFrame = {
    // One compiled pass per row (native `winnow_minima` Expression:
    // polynomial k-gram hashes + monotonic-deque trailing-window minima +
    // first-occurrence distinct) — no window-function shuffle, and no
    // interpreted per-character HOF lambdas. The previous all-HOF
    // formulation was already shuffle-free but evaluated ~4 lambda calls
    // per character; the fused expression is ~5x faster at sf0.1 with
    // bit-identical output (same hash, same trailing window, same
    // distinct order).
    graft.functions.NativeExpressions.register(docs.sparkSession)
    docs.repartition(col("doc_id"))
      .filter(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(expr(s"winnow_minima(text, $k, $window, $base)")).as("fp"))
  }

  /** SimHash near-duplicate pairs, COMPLETE for the advertised radius, with
    * two candidate-generation schemes selected by radius:
    *
    *   - `maxDist ≤ 7` — single-chunk pigeonhole: split the 64-bit signature
    *     into `maxDist + 1` near-equal chunks; a pair within the radius
    *     leaves ≥ 1 chunk untouched and meets in the chunk equi-join. Chunk
    *     width stays ≥ 8 bits in this range.
    *   - `maxDist ≥ 8` — generalized pigeonhole with 1-flip probe expansion
    *     (the HmSearch shape, Zhang et al. SSDBM'13): split into
    *     m = maxDist/2 + 1 chunks, so if EVERY chunk differed by ≥ 2 the
    *     total would be ≥ 2m > maxDist — some chunk has Hamming distance
    *     ≤ 1. The index side keys on the exact chunk; the probe side emits
    *     the chunk plus its 1→0 flips of each SET bit — a dist-1 chunk pair
    *     has exactly one side holding a '1' at the differing position, so
    *     that side's flip meets the other's exact key (dist-0 meets
    *     exact-exact), and restricting to set bits makes the match
    *     one-directional, halving both probe fan-out and duplicate
    *     candidates. Probe fan-out is ~m·(chunkLen/2+1) ≈ 40 keys/doc at
    *     maxDist = 12 — ~45× fewer than the C(16,4) = 1820 Manku
    *     block-combination keys this replaced, and a close pair collides in
    *     ≤ ~m indexes instead of up to C(16,4), which is what made the
    *     combination scheme quadratic-in-practice on a duplicate-heavy
    *     corpus.
    *
    * Both schemes emit every qualifying pair EXACTLY ONCE, so there is no
    * candidate `distinct` (and no shuffle at all downstream of the
    * signature scan): the join condition only accepts a match at the FIRST
    * chunk index whose chunk distance is within the per-chunk threshold
    * (earlier chunks all differ by more — unrolled per-chunk `hamming`
    * calls on the carried signatures), exact-key matches are tie-broken by
    * `pid < iid`, and flip matches are already one-directional. The native
    * `hamming` expression then filters to the exact radius inside the same
    * join condition. Recall is 100% by construction — the scheme only
    * changes cost shape. At 100 TB the per-index key space (2^9 at
    * maxDist = 12) is the dial to watch: a radius-12 ball of a 64-bit
    * simhash is inherently coarse (37% of ALL doc pairs qualify on the
    * correlated test corpus), and the scale answer is a wider signature —
    * pass `sigBits = 128` (md5 width; chunks double to ~18 bits at the
    * same radius and the chunk scheme adapts automatically), not more
    * index replication.
    */
  def simhashNearDupPairs(
      docs: DataFrame,
      maxDist: Int = 3,
      materialize: DataFrame => DataFrame = graft.engine.Materialize.local,
      sigBits: Int = 64): DataFrame = {
    require(maxDist >= 0 && maxDist < sigBits,
      s"simhashNearDupPairs: maxDist must be in [0, $sigBits), got $maxDist")
    graft.functions.NativeExpressions.register(docs.sparkSession)
    val sigs = materialize(simhashSignatures(docs, sigBits))

    // near-equal chunk boundaries over the sigBits-char bit string:
    // (start, len), start is 1-based for substring()
    def bounds(m: Int): Seq[(Int, Int)] = {
      val lens = (0 until m).map(i =>
        sigBits / m + (if (i < sigBits % m) 1 else 0))
      val starts = lens.scanLeft(1)(_ + _)
      (0 until m).map(i => (starts(i), lens(i)))
    }

    // per-chunk match threshold and chunk count: wide radii pair a 1-flip
    // probe expansion with threshold 1; narrow radii match chunks exactly
    val t = if (maxDist >= 8) 1 else 0
    val m = if (maxDist >= 8) maxDist / 2 + 1 else maxDist + 1
    val bs = bounds(m)

    // index side: (iid, ic, ichunk, sig_i) on exact chunks
    val exactStructs = bs.zipWithIndex.map { case ((st, ln), i) =>
      struct(lit(i).as("c"), expr(s"substring(simhash, $st, $ln)").as("chunk"))
    }
    val index = sigs
      .select(col("doc_id"), col("simhash"), explode(array(exactStructs: _*)).as("cc"))
      .select(col("doc_id").as("iid"), col("cc.c").as("ic"),
        col("cc.chunk").as("ichunk"), col("simhash").as("sig_i"))

    // probe side: (pid, pc, pchunk, ex, sig_p). ex marks the unmodified
    // chunk; for t = 1, j in [1, len] flips bit j ONLY where that bit is
    // '1' (canonical direction, so a dist-1 chunk pair meets exactly once:
    // the side holding the '1' probes the other's exact key) — all inside
    // one codegen'd narrow stage
    val probe =
      if (t == 0)
        index.toDF("pid", "pc", "pchunk", "sig_p").withColumn("ex", lit(true))
          .select(col("pid"), col("pc"), col("pchunk"), col("ex"), col("sig_p"))
      else {
        val variantArrays = bs.zipWithIndex.map { case ((st, ln), i) =>
          expr(
            s"""transform(
               |  filter(sequence(0, $ln),
               |    j -> j = 0 OR substring(simhash, $st + j - 1, 1) = '1'),
               |  j -> named_struct(
               |    'c', $i,
               |    'ex', j = 0,
               |    'chunk', CASE WHEN j = 0 THEN substring(simhash, $st, $ln)
               |      ELSE concat(
               |        substring(simhash, $st, j - 1),
               |        '0',
               |        substring(simhash, $st + j, $ln - j)) END))""".stripMargin)
        }
        sigs
          .select(col("doc_id"), col("simhash"),
            explode(flatten(array(variantArrays: _*))).as("cc"))
          .select(col("doc_id").as("pid"), col("cc.c").as("pc"),
            col("cc.chunk").as("pchunk"), col("cc.ex").as("ex"),
            col("simhash").as("sig_p"))
      }

    // single-emission + radius test INSIDE the join condition (native
    // single-pass expressions), so failing candidates are never written as
    // join output rows: the pair passes only at its first chunk index with
    // chunk distance ≤ t and within the exact radius — each pair is
    // emitted exactly once, so NO downstream distinct (no shuffle) is
    // needed. (Measured against evaluating a fused dist expression in the
    // projection + filter: losing the in-join test costs ~15% because
    // non-matching rows then materialize both signatures into output rows.)
    val once = expr(
      s"""pid != iid AND (NOT ex OR pid < iid)
         |AND first_chunk_within(sig_p, sig_i, $m, $t) = pc
         |AND hamming(sig_p, sig_i) <= $maxDist""".stripMargin)
    probe.join(index,
        col("pc") === col("ic") && col("pchunk") === col("ichunk") && once)
      .select(least(col("pid"), col("iid")).as("id_a"),
        greatest(col("pid"), col("iid")).as("id_b"),
        expr("hamming(sig_p, sig_i)").as("dist"))
  }

  /** 64-bit SimHash per document from distinct-token md5 hashes: per bit
    * position, majority vote of the token-hash bits. Output the signature as
    * a 64-char bit-string (exact in any engine; integer math only).
    */
  def simhashSignatures(docs: DataFrame, bits: Int = 64): DataFrame = {
    // Map-only, one compiled pass per row (native `simhash64` Expression).
    // History: the first formulation exploded tokens×64 rows through two
    // shuffles; the second was a narrow HOF stage but evaluated the
    // per-token majority vote through interpreted lambdas (~2s hidden in
    // every near-dup key at sf0.1); this one keeps the map-only shape with
    // the token/md5/vote loop compiled. Output is bit-identical (same
    // split-on-space tokens incl. empties, same md5-nibble bit
    // extraction, same strict-majority vote) — the DuckDB oracle is
    // unchanged.
    graft.functions.NativeExpressions.register(docs.sparkSession)
    docs.repartition(col("doc_id"))
      .select(col("doc_id"), expr(s"simhash64(text, $bits)").as("simhash"))
  }
}
