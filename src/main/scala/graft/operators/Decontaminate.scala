package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with a held-out eval corpus, so they can be dropped before
  * pretraining (the standard n-gram-overlap contamination check).
  *
  * Scale shape: the eval corpus is benchmark-sized — tiny next to a
  * 100 TB train corpus — so its distinct n-gram hashes BROADCAST and
  * the train side stays one scan: explode each train doc's (already
  * distinct, codegen-hashed) shingle set, broadcast-hash-join against
  * the eval grams, and partial-aggregate matches per doc. Only matching
  * (doc, gram) rows — a vanishing fraction — reach the one shuffle (the
  * per-doc count). Never a train×eval comparison; if the "eval" side
  * ever rivals the train side, use [[MinHash.neardupPairs]] instead.
  *
  * Engine parity: grams are the portable 32-bit md5-prefix shingle
  * hashes ([[MinHash.hashedShingles]]); the DuckDB oracle is generated
  * from the same n / threshold constants in [[oracleSql]]. */
object Decontaminate {

  /** Train docs sharing ≥ `minOverlap` distinct word n-grams with the
    * eval corpus. Output: idCol, n_overlap (the count of distinct
    * shared n-grams). */
  def overlaps(train: DataFrame, eval: DataFrame, idCol: String,
               textCol: String, n: Int = 3, minOverlap: Int = 1): DataFrame = {
    val evalGrams = eval
      .select(explode(MinHash.hashedShingles(col(textCol), n)).as("g"))
      .distinct()
    train
      .select(col(idCol), explode(MinHash.hashedShingles(col(textCol), n)).as("g"))
      .join(broadcast(evalGrams), "g")
      // per-doc shingle sets are distinct, so plain count = distinct count
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }

  /** DuckDB form of [[overlaps]] with eval = `$id % evalMod = 0` (the
    * query's simulated held-out split) — same shingle rule, same hash,
    * same threshold, generated from the same constants. */
  def oracleSql(table: String, id: String, text: String,
                n: Int, minOverlap: Int, evalMod: Int): String = {
    val gram = (0 until n).map(o => s"t[i+$o]").mkString(" || ' ' || ")
    s"""WITH tk AS (
       |  SELECT $id, string_split($text, ' ') AS t FROM $table),
       |hv AS (
       |  SELECT $id, list_distinct(list_transform(
       |    [$gram for i in generate_series(1, len(t)-${n - 1})],
       |    x -> ('0x'||substr(md5(x),1,8))::BIGINT)) AS h
       |  FROM tk WHERE len(t) >= $n),
       |eval_grams AS (
       |  SELECT DISTINCT unnest(h) AS g FROM hv WHERE $id % $evalMod = 0),
       |train AS (
       |  SELECT $id, unnest(h) AS g FROM hv WHERE $id % $evalMod <> 0)
       |SELECT train.$id, count(*) AS n_overlap
       |FROM train JOIN eval_grams USING (g)
       |GROUP BY 1 HAVING count(*) >= $minOverlap
       |ORDER BY 1""".stripMargin
  }
}
