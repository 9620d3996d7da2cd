package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines: token
  * counting, quality scoring, n-gram language ID, fingerprinting.
  * All pure `Column` expressions (higher-order functions, no UDFs) so
  * they stay inside whole-stage codegen and scale linearly — each is a
  * map-only operation until the caller aggregates.
  */
object TextFunctions {

  /** Whitespace tokens, lower-cased. Empty string ⇒ empty array (split
    * of "" yields [""], which we filter). */
  def tokens(text: Column): Column =
    filter(split(lower(text), " "), t => length(t) > 0)

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish proxy: alphanumeric runs (word pieces). Count of
    * `[a-z0-9]+` runs in the lower-cased text. */
  def wordPieceCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0))

  /** 64-bit-ish stable hash of a string: first 15 hex chars of md5 →
    * 60-bit non-negative long. Deterministic and reproducible in any
    * engine with md5 (the DuckDB oracle uses the same construction). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** 48-bit stable hash (first 12 hex chars of md5). Used as the ONE
    * per-shingle digest from which K minhash values are derived by
    * cheap affine maps — 16× fewer md5 calls than hashing (k, shingle)
    * pairs. 48 bits is ample below ~10M distinct shingles per doc set;
    * the 100 TB path widens to hash60. */
  def hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /** Word-shingles of size n (space-joined), for MinHash / Jaccard. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** Rolling-hash document fingerprint: md5 over the sorted distinct
    * token set — canonical form invariant to word order, the classic
    * near-dup canonicalization. */
  def sortedTokenFingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Stopword hit count for one language's marker list. */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isin(stopwords.map(lit): _*)))

  /** Tiny per-language marker lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small and deterministic. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "de"),
    "fr" -> Seq("le", "la", "les", "est", "et", "un", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和", "我", "不"))

  /** Language-ID: argmax of marker-hit counts, ties broken by language
    * code ascending; zero hits everywhere ⇒ "und". Pure expression —
    * scores land in a struct array sorted descending by (hits, -lang).
    */
  def langId(text: Column): Column =
    GraftExpressions.langIdFast(tokens(text), langMarkers)

  /** Quality signals: char count, token count, mean token length,
    * punctuation ratio, stopword ratio — combined into a [0,1]-ish
    * score. Returns a struct; callers project the fields they need. */
  def qualitySignals(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text)
    val nToks = size(toks)
    val alnum = length(regexp_replace(lower(text), "[^a-z0-9\\s]", ""))
    val punctRatio = when(nChars > 0,
      (nChars - alnum).cast("double") / nChars.cast("double")).otherwise(0.0)
    val allStop = langMarkers.flatMap(_._2).distinct
    val stopRatio = when(nToks > 0,
      stopwordHits(toks, allStop).cast("double") / nToks.cast("double"))
      .otherwise(0.0)
    val meanTokLen = when(nToks > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / nToks.cast("double")).otherwise(0.0)
    struct(
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      meanTokLen.as("mean_token_len"),
      punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"))
  }
}
