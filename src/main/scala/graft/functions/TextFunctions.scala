package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for document pipelines (SURVEY north star:
  * language-ID, quality scoring, token counting, fingerprinting over the
  * `documents` table). All are composed from built-in codegen'd expressions —
  * no UDFs — so they vectorize inside whole-stage codegen and scale linearly
  * with input at 100 TB (pure map-side, no shuffle).
  */
object TextFunctions {

  /** Whitespace tokenization of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Token count (long). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Lower-cased, whitespace-collapsed normalization used by dedup. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Hex MD5 fingerprint of normalized text — exact-dup key. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Overlapping character k-shingles of a (pre-normalized) string.
    * `substring` with a dynamic start has no literal-only limitation at the
    * SQL-expression level, so this stays codegen-friendly. */
  def charShingles(norm: Column, k: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(length(norm) - lit(k - 1), lit(1))),
        i => concat(norm, lit(" " * (k - 1))).substr(i, lit(k))))

  /** Word n-gram shingles from a token array. */
  def wordShingles(toks: Column, n: Int): Column =
    array_distinct(wordShinglesRaw(toks, n))

  /** Non-deduplicated word n-grams — for MIN-based consumers like MinHash,
    * where duplicates can't change the result and `array_distinct`'s O(n²)
    * would dominate the scan. */
  def wordShinglesRaw(toks: Column, n: Int): Column =
    transform(
      sequence(lit(0), greatest(size(toks) - lit(n), lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n))))

  /** Count of regex matches (thin alias; Spark 3.5+ regexp_count). */
  def matchCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Stopword count from a token array against a small inline set. */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords: _*))).cast("long")

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "in", "to", "is", "it", "for")

  /** Simple length/punctuation/stopword quality features. Mirrors the kind of
    * per-document heuristics used to filter LLM training corpora. */
  def punctCount(text: Column): Column = matchCount(text, "[.,!?;:]")
}
