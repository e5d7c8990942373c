package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Text-analysis functions for training-data pipelines: tokenization,
  * language-ID heuristic, quality scoring, token counting, fingerprinting.
  * All pure Catalyst expressions (codegen'd, partition-local, no shuffle)
  * — each runs in the scan's projection at 100 TB without adding a stage.
  *
  * Engine parity: every function here has an exact DuckDB-SQL mirror in
  * [[graft.queries.Docs]]; integer outputs are cast to long, ratio outputs
  * rounded to 4 decimals at the boundary.
  */
object Text {

  /** Whitespace tokens (the corpus is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish segmentation: letter runs, digit runs, single other chars. */
  val bpeRegex = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpeRegex), lit(0))).cast("long")

  def wsTokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Fraction of word n-grams that are repeats of an earlier n-gram in
    * the same doc (Gopher-style repetition signal: boilerplate and
    * looping generations score high). Scan-local and codegen'd: the
    * distinct count reuses the hashed-shingle kernel
    * ([[graft.operators.MinHash.hashedShingles]]) so no interpreted HOF
    * runs; the total is arithmetic on the token count. The rare 32-bit
    * shingle-hash collision affects the DuckDB mirror identically. */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val total = (wsTokenCount(text) - (n - 1)).cast("double")
    val uniq = size(graft.operators.MinHash.hashedShingles(text, n)).cast("double")
    round(when(total > 0, lit(1.0) - uniq / total).otherwise(lit(0.0)), 4)
  }

  /** Stopword lists for the n-gram language-ID heuristic. Deliberately
    * tiny — the point is the *operator* (per-language hit counting +
    * deterministic argmax), not NLP accuracy. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "los", "las", "y", "es", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"))

  /** Occurrences of any word from `set` among the tokens — one compiled
    * pass ([[StopwordHits]]); the interpreted `size(filter(...))` HOF
    * form it replaces is pinned equivalent in KernelSpec. */
  def stopwordHits(text: Column, set: Seq[String]): Column =
    element_at(GraftSqlBridge.column(
      StopwordHits(GraftSqlBridge.expression(text), Seq(set))), 1)

  /** Max single-token frequency in the doc (the Gopher "top-word
    * fraction" numerator) — one compiled pass ([[TopTokenCount]]);
    * KernelSpec pins it to the explode→groupBy declarative form. */
  def topTokenCount(text: Column): Column =
    GraftSqlBridge.column(TopTokenCount(GraftSqlBridge.expression(text)))

  /** Hit counts for ALL languages in ONE compiled tokenize pass —
    * `array<long>` aligned with [[stopwords]] order. Per-language HOF
    * counting re-tokenized the text once per language per row. */
  def allLangHits(text: Column): Column =
    GraftSqlBridge.column(
      StopwordHits(GraftSqlBridge.expression(text), stopwords.map(_._2)))

  /** `hits_<lang>` columns (from [[allLangHits]]'s array) keyed by lang. */
  def langHitCols(hitsArray: Column): Map[String, Column] =
    stopwords.zipWithIndex.map { case ((l, _), i) =>
      l -> element_at(hitsArray, i + 1)
    }.toMap

  /** Deterministic argmax over the per-language hit counts: highest count
    * wins, ties go to the alphabetically-first language. Expects columns
    * named hits_<lang> to exist (see Docs.doc_lang_id). */
  def predictLang(hits: Map[String, Column]): Column = {
    val langs = stopwords.map(_._1) // alphabetical
    langs.init.zipWithIndex.foldRight(lit(langs.last)) { case ((l, i), rest) =>
      val beatsAllLater = langs.drop(i + 1)
        .map(m => hits(l) >= hits(m)).reduce(_ && _)
      when(beatsAllLater, lit(l)).otherwise(rest)
    }
  }

  /** PII scrubbing for training corpora: regex-redact emails, phone
    * numbers and SSN-shaped ids. Pure regexp_replace chain — codegen'd,
    * partition-local, ~zero cost in the scan projection. Patterns kept
    * RE2/Java-portable (no lookarounds). */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "(\\+?[0-9]{1,3}[- .])?\\(?[0-9]{3}\\)?[- .]?[0-9]{3}[- .]?[0-9]{4}" -> "<PHONE>",
    "[0-9]{3}-[0-9]{2}-[0-9]{4}" -> "<SSN>")

  def scrubPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (re, tag)) =>
      regexp_replace(c, re, tag)
    }

  /** Polynomial rolling hash over the characters: a compact, exactly
    * reproducible document fingerprint (same recurrence in the DuckDB
    * oracle). acc = (acc*131 + code) mod 1e9+7 — one compiled pass
    * ([[RollingHash]]); the per-character interpreted `aggregate(split
    * (text, ''), ...)` HOF it replaces is pinned equivalent in
    * KernelSpec. */
  def fingerprint(text: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(text)))
}
