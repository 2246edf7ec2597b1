package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis Column kit for large-scale corpus processing. Everything is
  * built from codegen'd builtins (no UDFs) so it stays inside whole-stage
  * codegen on a 100 TB documents scan. Hashing that must be reproducible by
  * an external engine uses md5; Spark-internal fast paths use xxhash64.
  */
object TextFunctions {
  /** Whitespace tokens (simple split; the corpus is single-space normalized). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count heuristic: word-piece regex split — letters runs,
    * digit runs, single punctuation. Approximates tokenizer cost without a
    * vocab (counts are what a data pipeline budgets by).
    */
  def subwordCount(text: Column): Column =
    size(filter(split(text, "(?<=[^A-Za-z0-9])|(?=[^A-Za-z0-9])"), t => trim(t) =!= lit("")))

  /** Number of tokens belonging to a fixed stopword list. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(lit): _*)))

  /** Mean token length in characters (exact rational arithmetic until one
    * final double division — deterministic across engines).
    */
  def avgTokenLen(text: Column): Column = {
    val t = tokenCount(text)
    (length(text) - (t - lit(1))).cast("double") / t
  }

  /** Heuristic quality score in [0,1]: rewards mid-length docs and prose-like
    * stopword density. All integer/exact math until the final divisions.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text).cast("double")
    val stopRatio = stopwordHits(text, stopwords).cast("double") / nTok
    val lenScore = least(nTok / lit(64.0), lit(1.0))
    (lenScore + least(stopRatio * lit(4.0), lit(1.0))) / lit(2.0)
  }

  /** Canonical content fingerprint: md5 of lower-cased, whitespace-collapsed
    * text. Collapse runs BEFORE trim — trim only strips spaces, so leading/
    * trailing tabs/newlines must become spaces first. Reproducible
    * bit-for-bit by any engine with md5.
    */
  def fingerprint(text: Column): Column = md5(canonicalize(text))

  /** Fast 64-bit content fingerprint for Spark-internal dedup joins. */
  def fingerprint64(text: Column): Column = xxhash64(canonicalize(text))

  private def canonicalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Character n-gram shingles of the text (positions 1..len-n+1).
    * Native loop codegen ([[ShingleExpressions]]); the builtin HOF
    * formulation it replaced is kept in spec as the semantic reference.
    */
  def charShingles(text: Column, n: Int): Column =
    ShingleExpressions.char_shingles(text, n)

  /** Word n-gram shingles (native loop codegen, see [[charShingles]]). */
  def wordShingles(text: Column, n: Int): Column =
    ShingleExpressions.word_shingles(text, n)

  /** Deterministic argmax over per-language scores: highest score wins,
    * smallest language code breaks ties.
    */
  private def argmaxLang(scored: Seq[(String, Column)]): Column = {
    val structs = scored.map { case (lang, score) =>
      struct(score.as("hits"), lit(lang).as("lang"))
    }
    val best = structs.reduce((a, b) =>
      when(a.getField("hits") > b.getField("hits"), a)
        .when(a.getField("hits") < b.getField("hits"), b)
        .when(a.getField("lang") < b.getField("lang"), a)
        .otherwise(b))
    best.getField("lang")
  }

  /** Deterministic language-ID: stopword-hit counts per language, argmax with
    * lexicographic tiebreak. `profiles` maps language code → stopword list.
    */
  def langId(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    argmaxLang(profiles.map { case (lang, words) =>
      lang -> stopwordHits(text, words).cast("long")
    })

  /** Count of (possibly overlapping-free) occurrences of a literal substring,
    * via replace-length arithmetic — codegen'd builtins only.
    */
  def substringCount(text: Column, sub: String): Column =
    ((length(text) - length(regexp_replace(text, java.util.regex.Pattern.quote(sub), "")))
      / sub.length).cast("long")

  /** Email-address pattern shared by redaction and counting. Kept to the
    * regex subset Java and RE2 (DuckDB) interpret identically: character
    * classes, `+`, bounded `{2,}` — no backreferences, no lookaround.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NNN-NNNN phone fragment with word boundaries (the US-local shape;
    * extend the alternation for other formats).
    */
  val PhonePattern = "\\b[0-9]{3}-[0-9]{4}\\b"

  /** T11: PII scrubbing — replace email addresses and phone fragments with
    * typed placeholder tokens. A per-row regexp_replace chain: pushable,
    * shuffle-free, whole-stage-codegen'd — the shape a 100 TB redaction
    * pass needs (one scan, rewrite in place). Pattern coverage is the
    * policy knob; the operator is the plumbing.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Occurrence counts for the two PII shapes (audit metric beside the
    * scrub). group 0 = whole match, identical semantics in DuckDB's
    * regexp_extract_all.
    */
  def piiEmailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")

  def piiPhoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long")

  /** T3 upgrade: character-bigram frequency language-ID. Each language
    * profile is a weighted bigram list (weights from a reference corpus);
    * score = Σ weight × occurrences(bigram). Same deterministic argmax as
    * the stopword variant, far more robust on short or stopword-free text.
    */
  def langIdBigram(text: Column, profiles: Seq[(String, Seq[(String, Int)])]): Column = {
    val t = lower(text)
    argmaxLang(profiles.map { case (lang, bigrams) =>
      lang -> bigrams.map { case (bg, w) =>
        substringCount(t, bg) * w
      }.reduce(_ + _)
    })
  }
}
