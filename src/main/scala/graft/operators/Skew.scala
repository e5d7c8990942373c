package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual fallback when AQE's
  * runtime skew-split can't help (e.g. the skewed side feeds a window,
  * or the join key histogram is known up front).
  *
  * A shuffle equi-join hashes rows to `shuffle.partitions` reducers by
  * key; a viral key sends ALL its rows to one reducer, which then runs
  * as long as the whole rest of the stage. Salting splits each hot key
  * into `salts` sub-keys: the fact side appends a pseudorandom salt in
  * [0, salts), the dimension side replicates each row once per salt
  * value, and the join runs on (key, salt) — the hot key's rows now
  * spread over `salts` reducers at the cost of a `salts`× larger
  * dimension shuffle. Use when |dim| · salts ≪ |fact|'s hot keys.
  *
  * The salt is derived by hashing the fact row's full struct (not
  * `rand()`): deterministic across retries and replays, so a failed
  * stage recomputes identical partitions — required for exactly-once
  * sinks downstream. */
object Skew {

  /** Join-key skew profile — the diagnostics pass you run BEFORE
    * deciding whether [[saltedJoin]] (or AQE's skew split) is needed:
    * the top-K heaviest keys, each annotated with the global key
    * distribution (key count, total rows, max/median per-key weight,
    * and `skew_factor` = max/mean — >> 1 means one reducer runs as
    * long as the rest of the stage combined).
    *
    * Scale shape: per-key counts are ONE partial-agg shuffle on the
    * key; the distribution stats tree-reduce that counts frame to a
    * single broadcast row; the top-K is `orderBy.limit(K)` — Spark's
    * TakeOrderedAndProject keeps a K-row heap per partition, never a
    * global sort. Nothing here scales with the heavy key's row count,
    * only with the number of DISTINCT keys. */
  def keyProfile(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("total_rows"),
      max(col("cnt")).as("max_cnt"),
      expr("percentile(cnt, 0.5)").as("__med"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topK)
    top.crossJoin(broadcast(stats))
      .select(col("key"), col("cnt"),
        round(col("cnt").cast("double") / col("total_rows").cast("double"), 4)
          .as("share"),
        col("n_keys"), col("total_rows"), col("max_cnt"),
        (round(col("__med"), 4) + lit(0.0)).as("med_cnt"),
        round((col("max_cnt") * col("n_keys")).cast("double")
          / col("total_rows").cast("double"), 4).as("skew_factor"))
      .orderBy(col("cnt").desc, col("key"))
  }

  /** DuckDB mirror of [[keyProfile]]. */
  def keyProfileSql(table: String, keyExpr: String, topK: Int = 10): String =
    s"""WITH c AS (
       |  SELECT $keyExpr AS key, count(*) AS cnt FROM $table GROUP BY 1),
       |s AS (
       |  SELECT count(*) AS n_keys, sum(cnt) AS total, max(cnt) AS max_cnt,
       |         quantile_cont(cnt, 0.5) AS med FROM c),
       |t AS (SELECT key, cnt FROM c ORDER BY cnt DESC, key LIMIT $topK)
       |SELECT t.key, t.cnt,
       |  round(CAST(t.cnt AS DOUBLE) / CAST(s.total AS DOUBLE), 4) AS share,
       |  CAST(s.n_keys AS BIGINT) AS n_keys,
       |  CAST(s.total AS BIGINT) AS total_rows,
       |  CAST(s.max_cnt AS BIGINT) AS max_cnt,
       |  round(s.med, 4) + 0.0 AS med_cnt,
       |  round(CAST(s.max_cnt * s.n_keys AS DOUBLE)
       |    / CAST(s.total AS DOUBLE), 4) AS skew_factor
       |FROM t, s ORDER BY t.cnt DESC, t.key""".stripMargin

  /** Inner/left equi-join of `fact` with `dim` on `key`, salted
    * `salts` ways. Result rows are exactly those of the plain join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, not $joinType")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)),
        lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
