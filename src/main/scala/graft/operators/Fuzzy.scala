package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance-1 fuzzy self-match via deletion-neighborhood blocking
  * (the SymSpell/FastSS scheme) — record linkage for near-identical
  * identifiers (typo'd names, OCR'd ids, crawl-variant titles).
  *
  * Blocking key set K(s) = {s} ∪ {s with one char deleted}. Every pair
  * at edit distance ≤ 1 shares a key: a substitution at position i means
  * deleting i from both sides collides; an insertion means the longer
  * string's deletion IS the shorter string (∈ both key sets); equality
  * is the identity key. So the candidate equi-join has NO false
  * negatives, and the final `levenshtein ≤ 1` filter makes the output
  * EXACT — the oracle can be the quadratic theta join, and parity
  * proves blocked ≡ exact.
  *
  * Scale shape: keys are a scan-local explode (len+1 keys per string —
  * the standard ed-1 blocking amplification; bounded by the identifier
  * length, not the corpus), candidates come from one (key) equi-join
  * whose buckets hold only strings one deletion apart (~alphabet-sized,
  * never corpus-sized), pairs dedup on (a, b) before the verify so
  * multi-key collisions cost one distance call. The quadratic all-pairs
  * comparison never exists on the engine side at any scale.
  */
object Fuzzy {

  /** `{s} ∪ deletions(s)` as an array column over column NAME `name`
    * (1-indexed substring math; substring clamps past the end, so the
    * trailing length bound can be the full string length). */
  def deletionKeys(name: String): Column =
    array_union(
      array(col(name)),
      // greatest(…, 1): Spark's sequence(1, 0) would run DESCENDING;
      // an empty string then just contributes its identity key twice
      expr(s"transform(sequence(1, greatest(length($name), 1)), i -> " +
        s"concat(substring($name, 1, i-1), " +
        s"substring($name, i+1, length($name))))"))

  /** All (a, b) id pairs (a < b) whose names are at edit distance ≤ 1.
    * Exact output (blocking is recall-lossless, verify is exact).
    *
    * Names are dropped BEFORE the key join: candidates dedup on the
    * (long, long) id pair — ~4× cheaper to shuffle and hash than the
    * 4-string-column distinct — and the two name lookups re-attach via
    * plain id equi-joins only for the pairs that survived. */
  def editDistance1Pairs(df: DataFrame, idCol: String,
                         nameCol: String): DataFrame = {
    val keyed = df.select(col(idCol).as("__id"),
      explode(deletionKeys(nameCol)).as("__key"))
    val cands = keyed.as("a")
      .join(keyed.as("b"), col("a.__key") === col("b.__key")
        && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("a_id"), col("b.__id").as("b_id"))
      .distinct()
    val names = df.select(col(idCol).as("__nid"),
      col(nameCol).as("__nname"))
    cands
      .join(names, col("a_id") === col("__nid"))
      .withColumnRenamed("__nname", "a_name").drop("__nid")
      .join(names, col("b_id") === col("__nid"))
      .withColumnRenamed("__nname", "b_name").drop("__nid")
      .where(levenshtein(col("a_name"), col("b_name")) <= 1)
      .select(col("a_id"), col("b_id"))
  }

  /** DuckDB mirror — deliberately the QUADRATIC theta join: parity with
    * the blocked plan proves the blocking loses nothing. */
  def editDistance1PairsSql(table: String, id: String,
                            name: String): String =
    s"""SELECT a.$id AS a_id, b.$id AS b_id
       |FROM $table a JOIN $table b
       |  ON a.$id < b.$id AND levenshtein(a.$name, b.$name) <= 1""".stripMargin
}
