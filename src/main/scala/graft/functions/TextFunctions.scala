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

  /** Whitespace tokens, lower-cased. Splits on ANY whitespace run
    * (`\s+` — space, tab, newline, CR), not the literal space: real
    * documents are full of `\n`/`\t`, and a single-space split would
    * keep `"foo\nbar"` as one token, poisoning every token-derived
    * signal downstream (shingles, MinHash, BM25, token counts).
    * Empty string ⇒ empty array. Native one-pass byte scan
    * (GraftExpressions.WhitespaceTokens) with semantics identical to
    * `filter(split(lower(text), "\\s+"), len > 0)` — the regex split
    * + interpreted ArrayFilter it replaces cost ~1.3× on every
    * token-derived gate (r12 bench delta).
    * Oracle twin: DuckDB `string_split_regex(lower(x), '\s+')`. */
  def tokens(text: Column): Column =
    GraftExpressions.wsTokens(text)

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Harman's S-stemmer (1991) — the three-rule English plural
    * stripper: "…ies"→"…y" (unless eies/aies), "…es"→ drop the s
    * (unless aes/ees/oes), "…s"→ drop (unless us/ss); words under 4
    * chars pass through. One CASE chain of suffix tests — no
    * dictionary, no loops — chosen over Porter exactly because every
    * rule is a plain suffix predicate an oracle can mirror verbatim.
    */
  def sStem(w: Column): Column = {
    def ends(s: String) = w.endsWith(lit(s))
    val drop1 = w.substr(lit(1), length(w) - 1)
    val ies = concat(w.substr(lit(1), length(w) - 3), lit("y"))
    // A guard suffix TERMINATES its rule (the word stays) — it must
    // not fall through to the bare-s rule, or "trees" loses its s.
    when(length(w) >= 4 && ends("ies"),
        when(ends("eies") || ends("aies"), w).otherwise(ies))
      .when(length(w) >= 4 && ends("es"),
        when(ends("aes") || ends("ees") || ends("oes"), w)
          .otherwise(drop1))
      .when(length(w) >= 4 && ends("s") &&
        !ends("us") && !ends("ss"), drop1)
      .otherwise(w)
  }

  /** A BPE-ish proxy: alphanumeric runs (word pieces). Count of
    * Unicode letter/digit runs (`[\p{L}\p{N}]+`) in the lower-cased
    * text — NOT ASCII-only: a Cyrillic or CJK document must score
    * nonzero pieces or every quality signal consuming this silently
    * zeroes for non-English corpora. Java and RE2 (the DuckDB oracle)
    * agree on `\p{L}`/`\p{N}` over the BMP. */
  def wordPieceCount(text: Column): Column =
    size(filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0))

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

  /** The 27 printable cp1252 characters that live where ISO-8859-1
    * has C1 controls (0x80–0x9F) — the giveaway alphabet of
    * cp1252-decoded UTF-8 mojibake ("â€™" for ’, "â€œ" for “). Each
    * maps back to the C1 code point equal to its cp1252 byte, which
    * is also its ISO-8859-1 byte, so a single `translate` +
    * latin1-encode reconstructs the original UTF-8 byte stream. */
  private val Cp1252Printables =
    "€‚ƒ„…†‡ˆ‰Š" +
      "‹ŒŽ‘’“”•–—" +
      "˜™š›œžŸ"
  private val Cp1252AsC1 =
    "\u0080\u0082\u0083\u0084\u0085\u0086\u0087\u0088\u0089\u008A\u008B" +
      "\u008C\u008E\u0091\u0092\u0093\u0094\u0095\u0096\u0097\u0098\u0099" +
      "\u009A\u009B\u009C\u009E\u009F"

  /** A string of chars ≤ U+00FF whose implied byte sequence is VALID
    * multi-byte-bearing UTF-8 — the exact precondition under which
    * [[fixEncoding]] may reinterpret. Structured as the UTF-8 DFA in
    * regex form (RFC 3629 §4 table): ASCII, C2–DF+cont, E0 with the
    * overlong guard, ED with the surrogate guard, F0/F4 with the
    * plane guards. A char > U+00FF (real CJK, real é) fails the
    * class and vetoes the repair — that is the safety property. */
  private val Utf8BytesRe =
    "^(?:[\\x00-\\x7F]|[\\xC2-\\xDF][\\x80-\\xBF]|" +
      "\\xE0[\\xA0-\\xBF][\\x80-\\xBF]|" +
      "[\\xE1-\\xEC\\xEE\\xEF][\\x80-\\xBF]{2}|" +
      "\\xED[\\x80-\\x9F][\\x80-\\xBF]|" +
      "\\xF0[\\x90-\\xBF][\\x80-\\xBF]{2}|" +
      "[\\xF1-\\xF3][\\x80-\\xBF]{3}|" +
      "\\xF4[\\x80-\\x8F][\\x80-\\xBF]{2})*$"

  /** TRUE iff [[fixEncoding]] would change this string — the mojibake
    * census predicate: the string's chars, read back as the
    * cp1252/latin1 bytes they came from, form valid UTF-8 with at
    * least one multi-byte sequence. Clean ASCII has no multi-byte
    * sequence (nothing to repair); clean accented latin1 ("café") has
    * a lone continuation-position byte and fails the DFA; real
    * non-Latin text has chars > U+00FF and fails outright. */
  def isMojibake(text: Column): Column = {
    val mapped = translate(text, Cp1252Printables, Cp1252AsC1)
    mapped.rlike(Utf8BytesRe) && mapped.rlike("[\\x80-\\xFF]")
  }

  /** Repair cp1252-in-UTF-8 double encoding — ftfy's core fix as a
    * native codegen'd expression chain: UTF-8 bytes that were once
    * decoded as cp1252/latin1 and re-encoded ("cafÃ©", "â€œquotedâ€",
    * "å¤§" for 大) are mapped back to their original bytes
    * (`translate` undoes cp1252's 0x80–0x9F display chars, latin1
    * `encode` undoes the rest 1:1) and reinterpreted as UTF-8 —
    * but ONLY when that reinterpretation is exactly valid
    * ([[isMojibake]]): strings that fail the check pass through
    * untouched, which automatically protects clean ASCII, clean
    * latin1 accents, and real CJK. One pass repairs one layer of
    * mis-decoding; compose for the (rare) double-moji case. Unpaired
    * surrogates need no handling HERE: Tungsten's UTF8String layer
    * cannot represent them — a driver-side lone surrogate becomes
    * `?` at conversion and parquet never carries one — so every
    * string this expression sees is already interchange-valid.
    * Map-only at scan speed — run it BEFORE shingles/simhash/langId
    * so encoding damage never poisons dedup keys. */
  def fixEncoding(text: Column): Column = {
    val mapped = translate(text, Cp1252Printables, Cp1252AsC1)
    when(isMojibake(text),
      decode(encode(mapped, "ISO-8859-1"), "UTF-8")).otherwise(text)
  }

  /** Sentence segments: split on terminal-punctuation runs followed
    * by whitespace (`[.!?]+\s+`) OR on fullwidth-terminator runs
    * (`[。！？]+\s*`) — CJK writes no space after 。, so the
    * fullwidth branch must not require one; non-empty after
    * space-trim. No script routing needed (unlike
    * [[tokensScriptAware]]): the two terminator classes are disjoint
    * and the alternation is a single pass, so mixed-script text
    * segments on both. The deliberately lookbehind-free form — RE2
    * (the oracle engine) has no lookbehind, so the terminal run
    * itself is consumed; sentence LENGTHS therefore exclude their
    * closing punctuation — except the LAST ASCII sentence, whose
    * terminator has no following whitespace to split on and stays
    * attached (a fullwidth terminator is ALWAYS consumed, final one
    * included, because its branch needs no trailing whitespace).
    * All stated properties of the heuristic, not bugs. Empty text ⇒
    * empty array. */
  def sentenceSplit(text: Column): Column =
    filter(split(text, "[.!?]+\\s+|[。！？]+\\s*"),
      s => length(trim(s)) > 0)

  /** Character bigrams of the whitespace-condensed, lower-cased text —
    * the token unit for unspaced scripts (CJK, Thai), where whitespace
    * tokenization yields one giant token per sentence and every
    * token-derived signal (shingles, MinHash, token counts) goes
    * blind. One `zip_with` over the per-character array — no
    * per-element lambda touches the split subtree, so the regex work
    * stays O(n) per row. "ab cd" ⇒ ["ab","bc","cd"]; under-2-char
    * text ⇒ empty array. BMP-exact (Spark splits UTF-16 at code
    * points; the DuckDB oracle twin is `substr`-generated bigrams over
    * the same condensed text — both character-based). */
  def charBigrams(text: Column): Column = {
    val condensed = regexp_replace(lower(text), "\\s+", "")
    val chars = split(condensed, "(?!^)")
    // zip chars with their successors; the last element pairs with
    // zip_with's padding and is dropped by the exact-length filter —
    // no off-by-one slicing.
    filter(zip_with(chars, slice(chars, lit(2), size(chars)),
      (a, b) => concat(a, b)), s => length(s) === 2)
  }

  /** Script-aware tokens: route by [[scriptProfile]]'s dominant
    * class — character bigrams for CJK (whitespace tokenization is
    * meaningless on unspaced scripts: two CJK near-duplicates hash as
    * single giant tokens and are invisible to MinHash), whitespace
    * tokens ([[tokens]]) for everything else. Pure expression; the
    * routing predicate is 6 codegen'd regexp_counts at scan speed.
    * Drop-in for any `tokenizer` parameter in the dedup family. */
  def tokensScriptAware(text: Column): Column =
    when(scriptProfile(text).getField("dominant") === "cjk",
      charBigrams(text)).otherwise(tokens(text))

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
    // Unicode letter/digit, not ASCII — CJK/Cyrillic chars are text,
    // not punctuation (mirrors wordPieceCount's script-neutral class).
    val alnum = length(regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]", ""))
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

  /** The (class, BMP-range regex) table behind [[scriptProfile]] —
    * fixed order IS the dominant-tie priority. */
  private val scriptClasses: Seq[(String, String)] = Seq(
    // Basic Latin letters + Latin-1 Supplement/Extended-A/B letters
    // (U+00C0–U+024F).
    "latin" -> "[A-Za-zÀ-ɏ]",
    "cyrillic" -> "[Ѐ-ӿ]",
    // Kana (U+3040–U+30FF) + CJK Unified Ideographs (U+4E00–U+9FFF)
    // + Hangul syllables (U+AC00–U+D7A3).
    "cjk" -> "[぀-ヿ一-鿿가-힣]",
    "arabic" -> "[؀-ۿ]",
    "greek" -> "[Ͱ-Ͽ]",
    "digit" -> "[0-9]")

  /** Unicode-script census — the language-ID backstop [[langId]]'s
    * stopword markers cannot give for non-Latin text (no tokenizable
    * stopwords in unsegmented CJK; no Latin markers in Cyrillic):
    * per-class character counts over the six classes above plus the
    * dominant class — the class with the MAX count, ties resolved by
    * the table's fixed priority order (latin first), `und` when every
    * count is zero. BMP ranges only, so Spark's UTF-16 regex and a
    * codepoint-counting oracle agree exactly.
    *
    * Map-only expression chain (6 codegen'd regexp_counts) at scan
    * speed. Returns a struct `n_<class>…, dominant`; callers project
    * what they need. */
  def scriptProfile(text: Column): Column = {
    val counts = scriptClasses.map { case (name, re) =>
      name -> regexp_count(text, lit(re)).cast("long")
    }
    val dominant = counts.foldRight(lit("und")) { case ((name, c), rest) =>
      // First class (in priority order) that is ≥ every LATER class —
      // evaluated left to right, so earlier classes win ties.
      val laterMax = counts.dropWhile(_._1 != name).drop(1) match {
        case Nil => lit(0L)
        case Seq((_, only)) => only
        case later => greatest(later.map(_._2): _*)
      }
      when(c > 0 && c >= laterMax, lit(name)).otherwise(rest)
    }
    struct(counts.map { case (n, c) => c.as(s"n_$n") } :+
      dominant.as("dominant"): _*)
  }
}
