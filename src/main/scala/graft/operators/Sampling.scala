package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines.
  *
  * A training pipeline needs splits and samples that are (a) stable
  * across runs and engines — re-running the pipeline on a re-crawl must
  * put the same document in the same split, or eval sets leak into
  * train — and (b) free at scale. Both come from hashing the document
  * id into a bucket 0..n-1 with the engine-portable 32-bit md5 prefix
  * ([[MinHash.hash32]]) instead of `rand()`-style sampling:
  *
  *  - '''no shuffle, no state''': bucket assignment is a scan-local
  *    projection and sampling is a scan-local filter — at 100 TB this
  *    touches each row once, pushes the filter into the scan, and never
  *    materializes an ordering (vs `orderBy(rand()).limit(n)`, a global
  *    sort that dies at scale);
  *  - '''deterministic across engines''': the same md5-bucket rule is
  *    expressible in ANSI SQL, so the DuckDB oracle applies the
  *    identical rule (generated from the same constants — the SQL
  *    below IS the Scala constants, engines can't drift).
  */
object Sampling {

  /** Portable hash bucket 0..n-1 for a row id (any type; cast to its
    * string form first so Spark and SQL engines hash identical bytes). */
  def bucket(id: Column, n: Int): Column =
    pmod(MinHash.hash32(id.cast("string")), lit(n.toLong))

  /** DuckDB form of [[bucket]] — same md5-prefix rule, same bytes. */
  def bucketSql(id: String, n: Int): String =
    s"(('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 8))::BIGINT % $n)"

  /** Deterministic train/valid/test-style split assignment. `splits`
    * maps each label to a percentage; percentages must sum to 100.
    * A document's label depends only on its id — stable under
    * re-crawls, incremental appends, and engine choice. */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = bucket(col(idCol), 100)
    val cumulative = splits.scanLeft(0)(_ + _._2).tail
    // CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test':
    // fold the ranges right-to-left so the first matching range wins
    val caseExpr = splits.zip(cumulative).dropRight(1).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((label, _), hi)) => when(b < hi, lit(label)).otherwise(acc)
      }
    df.withColumn("split", caseExpr)
  }

  /** DuckDB CASE expression matching [[assignSplit]]. */
  def splitCaseSql(id: String, splits: Seq[(String, Int)]): String = {
    val b = bucketSql(id, 100)
    val cumulative = splits.scanLeft(0)(_ + _._2).tail
    val whens = splits.zip(cumulative).dropRight(1)
      .map { case ((label, _), hi) => s"WHEN $b < $hi THEN '$label'" }
    s"CASE ${whens.mkString(" ")} ELSE '${splits.last._1}' END"
  }

  /** Stratified deterministic sample: keep `pct(stratum)`% of each
    * stratum (default `defaultPct`% for unlisted strata) — the
    * training-mix rebalance (up/down-weight languages or sources)
    * as a scan-local filter. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       pct: Map[String, Int], defaultPct: Int): DataFrame = {
    val b = bucket(col(idCol), 100)
    val rate = pct.toSeq.sortBy(_._1).foldLeft(lit(defaultPct): Column) {
      case (acc, (stratum, p)) => when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    df.where(b < rate)
  }

  /** DuckDB WHERE fragment matching [[stratifiedSample]]. */
  def stratifiedWhereSql(id: String, stratum: String,
                         pct: Map[String, Int], defaultPct: Int): String = {
    val b = bucketSql(id, 100)
    val cases = pct.toSeq.sortBy(_._1)
      .map { case (s, p) => s"WHEN '$s' THEN $p" }.mkString(" ")
    s"$b < (CASE $stratum $cases ELSE $defaultPct END)"
  }
}
