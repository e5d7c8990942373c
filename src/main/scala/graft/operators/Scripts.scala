package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Script-mix / homoglyph screen (C118) — the third member of the
  * crawl-hygiene triple beside C113 (markup) and C116 (encoding
  * damage): per-doc counts of Latin / Cyrillic / CJK / Arabic
  * codepoints and a MIXED-SCRIPT-WORD flag (a word containing both
  * Latin and Cyrillic letters — the homoglyph-spoofing signature:
  * `pаypаl` with U+0430 inside a Latin word passes every
  * whole-doc language filter while being no natural language at all).
  * Multilingual corpora NEED per-script counts (a doc can be honestly
  * bilingual); only the intra-word mix is inherently suspicious,
  * which is why the two signals are separate columns.
  *
  * Counting is `length(text) - length(regexp_replace(text, cls, ""))`
  * per class — scan-local, no explode, no shuffle; the flag is one
  * rlike. All patterns are plain character-class ranges (Java∩RE2;
  * the range endpoints are printable literals). The `doc_script_mix`
  * oracle follows the C116 discipline: script runs are PLANTED by
  * doc_id over an ASCII base corpus and expected counts derive from
  * doc_id arithmetic alone. */
object Scripts {

  private val cyr = "[Ѐ-ӿ]"
  private val cjk = "[一-鿿]"
  private val arab = "[؀-ۿ]"

  private def countClass(text: Column, cls: String): Column =
    (length(text) - length(regexp_replace(text, cls, ""))).cast("long")

  def nCyrillic(text: Column): Column = countClass(text, cyr)
  def nCjk(text: Column): Column = countClass(text, cjk)
  def nArabic(text: Column): Column = countClass(text, arab)

  /** A single word (whitespace-delimited token) containing BOTH Latin
    * and Cyrillic letters, in either order and not necessarily
    * adjacent (`p1а` with a digit between the scripts still trips) —
    * the homoglyph signature. Bilingual text (scripts separated by
    * whitespace) does NOT trip this. */
  def hasMixedScriptWord(text: Column): Column =
    text.rlike("[A-Za-z]\\S*" + cyr + "|" + cyr + "\\S*[A-Za-z]")

  /** Per-doc script profile + dominant class label. */
  def profile(df: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val mixed = hasMixedScriptWord(textCol)
    df.select(idCol.as("doc_id"),
      nCyrillic(textCol).as("n_cyrillic"),
      nCjk(textCol).as("n_cjk"),
      nArabic(textCol).as("n_arabic"),
      mixed.cast("long").as("has_mixed_script_word"),
      when(mixed, "homoglyph_suspect")
        .when(nCjk(textCol) > 0, "cjk")
        .when(nCyrillic(textCol) > 0, "cyrillic")
        .when(nArabic(textCol) > 0, "arabic")
        .otherwise("latin").as("script_class"))
  }

  /** Deterministic planting for the oracle (doc_id % 8):
    * 0 → a 6-char Cyrillic word; 1 → a 4-char CJK run; 2 → a 6-char
    * Arabic word; 3 → a homoglyph word (2 Cyrillic U+0430 inside a
    * Latin word); ≥4 stays ASCII. */
  def plantScripts(text: Column, docId: Column): Column =
    when(docId % 8 === 0, concat(text, lit(" привет")))
      .when(docId % 8 === 1, concat(text, lit(" 数据处理")))
      .when(docId % 8 === 2, concat(text, lit(" بيانات")))
      .when(docId % 8 === 3, concat(text, lit(" pаypаl")))
      .otherwise(text)
}
