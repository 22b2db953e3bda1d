package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text analysis built from codegen'd builtins + higher-order
  * functions — no Scala UDFs, so everything stays inside Catalyst and the
  * same expressions run unchanged in batch and Structured Streaming.
  */
object TextFunctions {

  /** Whitespace tokens of a (trimmed) text column. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Canonical form used for exact-dup fingerprinting: lowercase, strip
    * non [a-z0-9 ], squeeze runs of spaces, trim.  Delegates to the
    * native [[NormTextFp]] (one pass; bit-identical to the former
    * `trim(regexp_replace(regexp_replace(lower(t), "[^a-z0-9 ]+", " "),
    * " +", " "))` chain — the spec pins both the adversarial fixtures
    * and a ScalaCheck property against that verbatim formulation).
    */
  def normText(text: Column): Column = NormTextFp.normTextFp(text)

  /** 128-bit content fingerprint (hex md5 of the normalized text). */
  def fingerprint(text: Column): Column = md5(encode(normText(text), "UTF-8"))

  /** Word n-gram shingles as an array of strings; empty array when the
    * document has fewer than n tokens.  Delegates to the native
    * [[WordShingles]] expression (same output as the HOF formulation
    * `transform(sequence(0, size-n), i => concat_ws(" ", slice(toks, i+1, n)))`
    * at a fraction of the per-row cost).
    */
  def shingles(text: Column, n: Int): Column =
    WordShingles.wordShingles(tokens(text), n)

  val defaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "on", "for")

  /** Fraction of tokens that are stopwords (0 when the doc is empty).
    * Counting goes through the native [[CountInSet]] (hash probe per
    * token; same result as `size(filter(toks, _.isin(stop)))`).
    */
  def stopwordRatio(text: Column, stop: Seq[String] = defaultStopwords): Column = {
    val toks = tokens(text)
    val stops = CountInSet.countInSet(toks, stop)
    when(size(toks) > 0, stops / size(toks)).otherwise(lit(0.0))
  }

  /** Fraction of characters that are sentence punctuation. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))) / length(text))
      .otherwise(lit(0.0))
}
