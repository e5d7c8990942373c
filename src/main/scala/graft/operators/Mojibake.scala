package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Encoding-damage screen (C116) — the sibling of C113's HTML strip in
  * the crawl-cleaning chain: text that survived a bad
  * decode→encode→decode round-trip poisons tokenizers and dedup alike,
  * and the damage has three canonical signatures:
  *
  *  - **U+FFFD replacement characters** — a strict decoder already
  *    gave up (lossy: the original bytes are gone);
  *  - **C1 control characters** (U+0080–U+009F) — Windows-125x bytes
  *    decoded as Latin-1/ISO-8859-1 (the smart-quote band);
  *  - **UTF-8-read-as-Latin-1 digraphs** (the "Ã-ladder"): a UTF-8
  *    two-byte sequence C3 xx / C2 xx re-decoded as Latin-1 shows as
  *    `Ã`/`Â` (U+00C3/U+00C2) followed by a character in
  *    U+00A0–U+00BF (café → cafÃ©). Unlike U+FFFD this damage is
  *    REVERSIBLE, which is why screens separate the classes.
  *
  * Detection is three scan-local `rlike`s over character classes
  * (Java∩RE2 subset, written as \\u escapes so no raw control bytes
  * live in source) — zero shuffle per doc; the per-source report is
  * one aggregation. The `doc_mojibake*` oracles follow the C113
  * discipline: corruption is PLANTED deterministically by doc_id and
  * the oracle derives the expected flags from doc_id arithmetic alone,
  * so a hash match proves the detectors fire exactly where damage
  * exists (and nowhere else). */
object Mojibake {

  def hasReplacement(text: Column): Column = text.rlike("\\uFFFD")

  def hasC1Controls(text: Column): Column =
    text.rlike("[\\u0080-\\u009F]")

  def hasLatin1Mojibake(text: Column): Column =
    text.rlike("[\\u00C2\\u00C3][\\u00A0-\\u00BF]")

  /** Per-doc damage flags (longs — the engine-boundary form) and the
    * dominant damage class in severity order (replacement is lossy,
    * C1 is suspicious, the Ã-ladder is reversible). */
  def flags(df: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val repl = hasReplacement(textCol)
    val c1 = hasC1Controls(textCol)
    val moji = hasLatin1Mojibake(textCol)
    df.select(idCol.as("doc_id"),
      repl.cast("long").as("has_replacement"),
      c1.cast("long").as("has_c1"),
      moji.cast("long").as("has_latin1_mojibake"),
      when(repl, "replacement").when(c1, "c1_controls")
        .when(moji, "latin1_mojibake").otherwise("clean")
        .as("damage_class"))
  }

  /** Per-source damage report: counts per class + damaged rate as an
    * exact e4 integer ladder (truncating div — both engines floor on
    * non-negative operands). */
  def report(df: DataFrame, textCol: Column, sourceCol: Column): DataFrame = {
    val repl = hasReplacement(textCol).cast("long")
    val c1 = hasC1Controls(textCol).cast("long")
    val moji = hasLatin1Mojibake(textCol).cast("long")
    val any = greatest(repl, c1, moji)
    df.groupBy(sourceCol.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(repl).as("n_replacement"),
        sum(c1).as("n_c1"),
        sum(moji).as("n_latin1_mojibake"),
        sum(any).as("__n_damaged"))
      .withColumn("damaged_e4", expr("(10000 * __n_damaged) div n_docs"))
      .drop("__n_damaged")
  }

  /** Deterministic planted corruption (the oracle's independent truth:
    * class = doc_id % 10 ∈ {0,1,2}; ≥3 stays clean). The planted
    * strings use \\u escapes: U+FFFD runs, C1 NEL/PU2 controls, and
    * the Ã-ladder digraphs Ã© (C3 A9 as Latin-1) / Ã¨ (C3 A8). */
  def plantDamage(text: Column, docId: Column): Column =
    when(docId % 10 === 0, concat(text, lit(" x\uFFFD\uFFFD\uFFFDy")))
      .when(docId % 10 === 1, concat(text, lit(" a\u0085b\u0092c")))
      .when(docId % 10 === 2,
        concat(text, lit(" caf\u00C3\u00A9 cr\u00C3\u00A8me")))
      .otherwise(text)
}
