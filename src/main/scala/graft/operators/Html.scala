package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML boilerplate stripping (C113) — the FIRST step of every crawl
  * pipeline: raw pages carry markup, head/script/style payloads and
  * entity-encoded text that must become clean prose before any
  * dedup/quality/tokenize stage sees it (the trafilatura/jusText
  * extraction niche, reduced to its deterministic core).
  *
  * [[strip]] is a fixed chain of engine-portable string rewrites:
  * (1) drop `<head>`/`<script>`/`<style>` elements WITH their content
  * (lazy-dot-all patterns — one per element: RE2, DuckDB's regex
  * engine, has no backreferences); (2) drop every remaining tag;
  * (3) decode the core entities (`&lt;` `&gt;` then `&amp;` LAST, so
  * double-encoded text decodes one level exactly like a single-pass
  * parser); (4) collapse whitespace runs and trim. Every pattern is
  * chosen inside the Java-regex ∩ RE2 common subset (no backrefs, no
  * lookaround, greedy/lazy quantifiers only), so both engines rewrite
  * identically.
  *
  * The `doc_html_strip` oracle does NOT replay the regex chain — it
  * derives the expected output INDEPENDENTLY from the raw text and the
  * known wrapper, so a hash match proves the strip extracts exactly
  * the page's prose (dropping head/script/style, keeping nav/footer
  * TEXT, decoding entities), not merely that two engines ran the same
  * rewrite. Scale shape: scan-local per-row string work, no shuffle. */
object Html {

  /** Deterministic page wrapper for the synthetic corpus: head with
    * title/style/script payloads that must VANISH, an entity-encoded
    * nav whose TEXT must survive, the document body, and a footer. */
  def synthesize(docId: Column, text: Column): Column =
    concat(
      lit("<html><head><title>Doc "), docId,
      lit("</title><style>p{margin:0}</style>" +
        "<script>var a=1;</script></head>" +
        "<body><div id=\"nav\">Home &amp; About &lt;here&gt;</div><p>"),
      text,
      lit("</p><footer>(c) 2026</footer></body></html>"))

  /** What a correct strip of [[synthesize]]'s page yields — derived
    * from the raw text alone (the independent oracle side). The final
    * whitespace collapse mirrors [[strip]]'s last stage (a strip
    * normalizes whitespace, so the expectation must state the same
    * normal form); everything before it is independent. */
  def expected(text: Column): Column =
    trim(regexp_replace(
      concat(lit("Home & About <here> "), text, lit(" (c) 2026")),
      "[ \\t\\r\\n]+", " "))

  /** The production strip chain (see object docs). Block-element drop
    * is case-insensitive and word-bounded — `<HEAD>` matches, and
    * `<header>` does NOT match the `head` pattern (a real crawl page's
    * `<header>` element preceding a literal `</head>` must not lose its
    * content); the closing tag tolerates trailing whitespace
    * (`</script >` is valid HTML). All still inside the Java∩RE2
    * subset (flags + lazy quantifiers only, no lookaround). */
  def strip(html: Column): Column = {
    val noBlocks = Seq("head", "script", "style").foldLeft(html)((c, el) =>
      regexp_replace(c, s"(?si)<$el(\\s[^>]*)?>.*?</$el\\s*>", " "))
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = regexp_replace(
      regexp_replace(
        regexp_replace(noTags, "&lt;", "<"),
        "&gt;", ">"),
      "&amp;", "&")
    trim(regexp_replace(decoded, "[ \\t\\r\\n]+", " "))
  }
}
