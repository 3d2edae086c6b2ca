package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives for the training-data pipeline operators (dedup,
  * language-ID, quality scoring, fingerprinting). All pure `Column`
  * expressions over built-ins — codegen'd, shuffle-free until the caller
  * aggregates.
  */
object TextFunctions {

  /** Tokenization on a pluggable separator regex. The default single-space
    * split matches the fixture corpus (single-space separated) byte for
    * byte; real multilingual corpora pass a separator class — e.g.
    * `"[^\\p{L}\\p{N}]+"` (any non-letter/digit run) — through the same
    * code path. Edge separators produce empty tokens in every engine's
    * split; [[tokensNonEmpty]] is the variant that drops them.
    */
  def tokens(text: Column, sepRe: String = " "): Column = split(text, sepRe)

  /** [[tokens]] with empty tokens dropped — the honest token stream under a
    * separator-class regex (leading/trailing separators and runs collapse
    * instead of minting "" tokens). Mirrors DuckDB's
    * `list_filter(regexp_split_to_array(...), x -> x != '')`.
    */
  def tokensNonEmpty(text: Column, sepRe: String): Column =
    filter(tokens(text, sepRe), t => t =!= "")

  /** Word n-gram shingles as an array column; empty for docs shorter than
    * `n` tokens. Backed by the native [[NativeExpressions.WordShingles]]
    * generator — bit-identical to (and spec-checked against) the HOF
    * formulation `when(size(toks) >= n, transform(sequence(1,
    * size(toks)-n+1), i -> concat_ws(" ", element_at(toks, i), …)))
    * .otherwise(array())`, whose lambda evaluated INTERPRETED per shingle
    * on every text key's hot explode.
    */
  def wordShingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.PlanBuilder.columnOf(
      NativeExpressions.WordShingles(
        org.apache.spark.sql.graft.PlanBuilder.expressionOf(toks), n))

  /** md5 of a string column as lowercase hex — the cross-engine stable hash
    * used for fingerprints, MinHash and SimHash.
    */
  def md5Hex(c: Column): Column = md5(c.cast("binary"))

  /** Content-defined document fingerprint: hash of the normalized text. */
  def fingerprint(text: Column): Column = md5Hex(lower(trim(text)))

  /** Token count / distinct-token count, under the same pluggable
    * separator as [[tokens]] (pass a separator class for real corpora —
    * see `text_token_count_regex` for the oracle-mirrored variant).
    */
  def tokenCount(text: Column, sepRe: String = " "): Column =
    size(tokens(text, sepRe)).cast("long")
  def distinctTokenCount(text: Column, sepRe: String = " "): Column =
    size(array_distinct(tokens(text, sepRe))).cast("long")

  /** Stopword-ratio language-ID heuristic: predict `lang` when at least
    * `1/ratioDen` of tokens are in the language's stopword list. An n-gram
    * model would slot in the same way; the contract is a deterministic score
    * over token membership.
    */
  def langIdHeuristic(
      text: Column,
      stopwords: Seq[String] = Seq("the", "a", "of", "and"),
      lang: String = "en",
      ratioDen: Int = 10,
      sepRe: String = " "): Column = {
    val toks = tokens(text, sepRe)
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    when(hits * ratioDen >= size(toks), lit(lang)).otherwise(lit("unk"))
  }

  /** Integer-only quality features: char/letter counts plus a
    * length-band flag. Exact in any engine (no floating point).
    */
  def qualityFlag(
      text: Column, minTokens: Int = 20, maxTokens: Int = 400,
      sepRe: String = " "): Column =
    when(size(tokens(text, sepRe)).between(minTokens, maxTokens), lit(1))
      .otherwise(lit(0))

  /** PII patterns, deliberately limited to RE2 ∩ java.util.regex syntax
    * (no backreferences, no lookaround) so the same pattern string runs in
    * Spark, DuckDB/RE2-based engines, and most log scrubbers unchanged.
    */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRe = "\\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** Count of non-overlapping PII matches of `re` — map-only, codegen'd. */
  def piiCount(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0))).cast("long")

  /** Redact emails, then phones, then IPv4s (fixed order — replacement
    * text must not create later-pass matches, and an oracle mirrors the
    * same order). regexp_replace replaces ALL occurrences in Spark; RE2
    * engines need the 'g' flag to match.
    */
  def piiScrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")
}
