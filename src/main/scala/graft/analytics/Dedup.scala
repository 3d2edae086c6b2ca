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

  /** Distinct word-`n`-gram shingles per document: (doc_id, s). The base
    * relation for Jaccard and MinHash.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), explode(wordShingles(tokens(col("text")), n)).as("s"))
      .distinct()

  /** N-gram Jaccard near-duplicate pairs, exact: |A∩B| via shingle
    * self-join, |A∪B| = |A|+|B|−|A∩B|, thresholded with integer
    * cross-multiplication (`thresholdDen * inter >= union` ⇔ Jaccard ≥
    * 1/thresholdDen) so no floating point is involved.
    *
    * The self-join shuffles on the shingle string — at scale this is the
    * standard candidate-generation shuffle; pair it with [[lshCandidatePairs]]
    * to cut the candidate set first.
    */
  def ngramJaccardPairs(
      docs: DataFrame,
      n: Int = 3,
      thresholdDen: Int = 5): DataFrame = {
    val sh = shingles(docs, n)
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

  /** MinHash signatures: for each of `numHashes` seeded hash functions,
    * the minimum md5 over the document's shingles. The md5 hex string is the
    * hash value — lexicographic min of fixed-width hex equals numeric min of
    * the 128-bit value, and is bit-identical in every engine.
    * Output: (doc_id, j, h).
    */
  def minHashSignatures(docs: DataFrame, numHashes: Int = 8, n: Int = 3): DataFrame =
    shingles(docs, n)
      .select(col("doc_id"), col("s"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("j"))
      .select(col("doc_id"), col("j"),
        md5Hex(concat(col("j").cast("string"), lit(":"), col("s"))).as("hv"))
      .groupBy(col("doc_id"), col("j"))
      .agg(min(col("hv")).as("h"))

  /** LSH banding over MinHash signatures: hash each band of `rowsPerBand`
    * consecutive minhashes to a bucket key. Output: (doc_id, band, bkey).
    */
  def lshBands(docs: DataFrame, numHashes: Int = 8, rowsPerBand: Int = 4, n: Int = 3): DataFrame =
    minHashSignatures(docs, numHashes, n)
      .withColumn("band", (col("j") / rowsPerBand).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5Hex(
        expr("array_join(transform(sort_array(collect_list(struct(j, h))), x -> x.h), ',')"))
        .as("bkey"))

  /** MinHash+LSH candidate pairs: documents sharing at least one band
    * bucket, with the number of shared bands. The bucket join shuffles on
    * (band, bkey) — the LSH scale path: candidates ≪ all-pairs.
    */
  def lshCandidatePairs(docs: DataFrame, numHashes: Int = 8, rowsPerBand: Int = 4, n: Int = 3): DataFrame = {
    val bands = lshBands(docs, numHashes, rowsPerBand, n)
    val a = bands.toDF("id_a", "band", "bkey")
    val b = bands.toDF("id_b", "band", "bkey")
    a.join(b, Seq("band", "bkey")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("band")).distinct()
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
  }

  /** 64-bit SimHash per document from distinct-token md5 hashes: per bit
    * position, majority vote of the token-hash bits. Output the signature as
    * a 64-char bit-string (exact in any engine; integer math only).
    */
  def simhashSignatures(docs: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(array_distinct(tokens(col("text")))).as("t"))
      .select(col("doc_id"), md5Hex(col("t")).as("h"))
    toks
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(63))).as("b"))
      // hex digit at position b/4, bit (3 - b%4) within it
      .withColumn("hv",
        expr("CAST(conv(substring(h, 1 + CAST(b / 4 AS INT), 1), 16, 10) AS BIGINT)"))
      .withColumn("bit", expr("(shiftright(hv, 3 - b % 4)) & 1"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("bit") * 2 - 1).as("vote"))
      .withColumn("sbit", when(col("vote") > 0, lit("1")).otherwise(lit("0")))
      .groupBy(col("doc_id"))
      .agg(expr("array_join(transform(sort_array(collect_list(struct(b, sbit))), x -> x.sbit), '')")
        .as("simhash"))
  }
}
