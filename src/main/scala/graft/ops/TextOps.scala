package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token statistics, quality scoring, language guessing, fingerprinting.
  *
  * All pure `Column` composition over `org.apache.spark.sql.functions` — no
  * UDFs, so every operator stays inside whole-stage codegen and scales
  * linearly with the scan. (The reference has no scalar-function library at
  * all — it defers to Cypher/MongoDB, SURVEY.md §2.9 — so this module is the
  * engine-extension surface the 100 TB pipeline needs.)
  */
object TextOps {

  /** Whitespace tokenization — the deliberately simple, oracle-stable
    * baseline (`split(text, ' ')`, matching DuckDB `string_split`). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def uniqueTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast("long")

  /** Type-token ratio: unique/total, a standard lexical-diversity quality
    * signal. Single double division — deterministic across engines. */
  def typeTokenRatio(text: Column): Column =
    round(uniqueTokenCount(text).cast("double") / tokenCount(text), 4)

  /** Fraction of tokens in `stops`. */
  def stopwordRatio(text: Column, stops: Seq[String]): Column = {
    val stopArr = array(stops.map(lit): _*)
    round(
      size(filter(tokens(text), t => array_contains(stopArr, t))).cast("double")
        / tokenCount(text), 4)
  }

  /** BPE-ish subword count: whitespace words plus intra-word splits on
    * letter/digit boundaries — a cheap token-count estimator for budgeting
    * (regexp-based, codegen'd). */
  def subwordCount(text: Column): Column =
    size(filter(split(regexp_replace(text,
      "([a-zA-Z])([0-9])|([0-9])([a-zA-Z])", "$1$3 $2$4"), "\\s+"),
      t => length(t) > 0)).cast("long")

  /** Stopword-overlap language guess. Each language scores
    * `|distinct(tokens) ∩ markers|`; ties break by list order (en, es, de).
    * Mirrors an n-gram-frequency classifier at its crudest, but is exactly
    * replicable in ANSI-ish SQL for the oracle. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("la", "el", "de", "y"),
    "de" -> Seq("der", "die", "das", "und"))

  def langScore(text: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(tokens(text)),
      array(markers.map(lit): _*))).cast("long")

  def langGuess(text: Column): Column = {
    val scored = langMarkers.map { case (l, m) => (l, langScore(text, m)) }
    val best = scored.map(_._2).reduce(greatest(_, _))
    scored.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** PII redaction: emails, North-American-style phone numbers, and IPv4
    * addresses replaced by typed placeholder tokens — the scrubbing pass a
    * training-data pipeline runs before anything else sees the text. Three
    * chained `regexp_replace` calls, all codegen'd, zero shuffles — a pure
    * map over the corpus, which is the only shape this op is allowed to
    * have at 100 TB. The patterns deliberately use only syntax shared by
    * Java regex and RE2 (character classes, `\b`, bounded repetition; no
    * lookaround, no backreferences) so external engines replay the scrub
    * identically — the DuckDB oracle runs the same three patterns. Order
    * matters and is fixed: emails first (their local part may contain
    * digit runs a later pattern could shred), then phones, then IPs. */
  def scrubPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"
    val ipv4 = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        phone, "<PHONE>"),
      ipv4, "<IP>")
  }

  /** Canonicalization before dedup (the C4/RefinedWeb step): lowercase,
    * fold every non-letter/digit to a space, collapse runs, trim. Makes
    * exact dedup catch case/punctuation/whitespace variants of the same
    * document — the difference between "exact" and "trivially evaded" at
    * corpus scale. Patterns stay in the Java-regex ∩ RE2 subset (like
    * [[scrubPii]]) so external engines replay the normalization
    * byte-for-byte (q105's oracle). Pure Column, zero shuffles. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^\\p{L}\\p{N}\\s]", " "),
      "\\s+", " "))

  /** Document fingerprints. `md5` for exact identity; the rolling
    * polynomial hash (base-31 over character codes, 63-bit) is the
    * shift-resistant variant used for near-dup blocking. */
  def fingerprintMd5(text: Column): Column = md5(text)

  def rollingHash(text: Column): Column =
    aggregate(
      transform(split(text, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      // modulus keeps acc*31+c < 2^35 — no ANSI long overflow
      (acc, c) => pmod(acc * 31 + c, lit(1000000007L)))

  /** Fraction of non-empty lines that are duplicates of an earlier line —
    * the classic boilerplate/navigation-chrome signal (repeated headers,
    * cookie banners). 0.0 for line-less or all-distinct documents. */
  def dupLineRatio(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => length(l) > 0)
    round(when(size(lines) > 0,
      lit(1.0) - size(array_distinct(lines)).cast("double") / size(lines))
      .otherwise(lit(0.0)), 4)
  }

  /** Fraction of word `n`-gram occurrences that are duplicates — the
    * within-document repetition ratio quality filters threshold on
    * (repetitive generations, keyword stuffing). 0.0 for docs shorter
    * than `n` words. */
  def dupNgramRatio(text: Column, n: Int): Column = {
    val grams = Corpus.wordNgrams(text, n)
    round(when(size(grams) > 0,
      lit(1.0) - size(array_distinct(grams)).cast("double") / size(grams))
      .otherwise(lit(0.0)), 4)
  }

  /** Share of all word `n`-gram occurrences taken by the single most
    * frequent n-gram — high values flag documents dominated by one
    * repeated phrase. O(distinct·total) per document (nested array scan),
    * bounded by document length, inside codegen — never a shuffle. */
  def topNgramFraction(text: Column, n: Int): Column = {
    val grams = Corpus.wordNgrams(text, n)
    round(when(size(grams) > 0,
      array_max(transform(array_distinct(grams),
        g => size(filter(grams, x => x === g)))).cast("double") / size(grams))
      .otherwise(lit(0.0)), 4)
  }

  /** Bundled within-document repetition row (the repetition-family
    * quality filters): duplicate-line ratio, duplicate word-n-gram ratio,
    * and the top n-gram's occurrence share. Like [[qualityStruct]], pure
    * Column composition — one codegen'd pass over the scan. */
  def repetitionStruct(text: Column, n: Int = 2): Column =
    struct(
      dupLineRatio(text).as("dup_line_ratio"),
      dupNgramRatio(text, n).as("dup_ngram_ratio"),
      topNgramFraction(text, n).as("top_ngram_frac"))

  /** Bundled quality row: the standard cheap filters (length, diversity,
    * stopword density) a pretraining pipeline gates on. */
  def qualityStruct(text: Column, stops: Seq[String] = Seq("the", "a", "of")): Column =
    struct(
      tokenCount(text).as("n_tokens"),
      uniqueTokenCount(text).as("n_unique"),
      typeTokenRatio(text).as("ttr"),
      stopwordRatio(text, stops).as("stop_ratio"),
      (length(text) < 100).as("is_short"))
}
