package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANN self-evaluation: recall of each approximate search path against
  * the exact brute-force baseline, per probe — the table you read before
  * trusting an index tier (and the regression gate when re-tuning LSH
  * band counts, IVF nprobe, or PQ codebooks: a parameter change that
  * drops recall shows up here as a row, not as silently worse training
  * data downstream).
  *
  * Scale shape: every input is an already-computed top-k result —
  * |probes|·k rows each — so the whole report runs on probe-sized
  * frames: one union, one equi-join on (probe_id, neighbor_id), one
  * grouped count, and a spine join so a method that returns NOTHING for
  * a probe still reports recall 0 (dropping the row would hide exactly
  * the failure the report exists to catch). The corpus itself is
  * touched only by the search paths being evaluated.
  *
  * Determinism: counts are exact longs; recall is one small-integer
  * division rounded at the boundary. */
object AnnEval {

  /** Per-(method, probe) recall report. `exact` and each path must carry
    * (probe_id, neighbor_id); extra columns are ignored. */
  def recallReport(exact: DataFrame,
                   paths: Seq[(String, DataFrame)]): DataFrame = {
    val spark = exact.sparkSession
    val ex = exact.select(col("probe_id"), col("neighbor_id"))
      .withColumn("hit", lit(1L))
    val nExact = ex.groupBy("probe_id").agg(count(lit(1)).as("n_exact"))
    val methods = paths.map { case (m, _) =>
      spark.range(1).select(lit(m).as("method"))
    }.reduce(_ unionByName _)
    // (method x probe) spine: every pair reports, even with 0 results
    val spine = nExact.crossJoin(methods)
    val counts = paths.map { case (m, df) =>
      df.select(col("probe_id"), col("neighbor_id"))
        .withColumn("method", lit(m))
    }.reduce(_ unionByName _)
      .join(ex, Seq("probe_id", "neighbor_id"), "left")
      .groupBy(col("method"), col("probe_id"))
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
    spine.join(counts, Seq("method", "probe_id"), "left")
      .select(col("method"), col("probe_id"),
        coalesce(col("n_returned"), lit(0L)).as("n_returned"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("n_exact"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_exact"), 4).as("recall"))
  }

  /** DuckDB mirror of [[recallReport]]: each input SQL is any statement
    * yielding (probe_id, neighbor_id, ...) — the existing per-path
    * oracle generators compose in directly as subqueries. */
  def recallReportSql(exactSql: String,
                      pathSqls: Seq[(String, String)]): String = {
    val methodRows = pathSqls.map { case (m, _) => s"('$m')" }.mkString(", ")
    val unions = pathSqls.map { case (m, sql) =>
      s"SELECT '$m' AS method, probe_id, neighbor_id FROM ($sql)"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH ex AS (
       |  SELECT probe_id, neighbor_id FROM ($exactSql)),
       |nex AS (SELECT probe_id, count(*) AS n_exact FROM ex GROUP BY 1),
       |methods AS (SELECT * FROM (VALUES $methodRows) m(method)),
       |spine AS (SELECT method, probe_id, n_exact FROM methods, nex),
       |ap AS (
       |  $unions),
       |j AS (
       |  SELECT ap.method, ap.probe_id,
       |         CASE WHEN ex.probe_id IS NULL THEN 0 ELSE 1 END AS hit
       |  FROM ap LEFT JOIN ex
       |    ON ap.probe_id = ex.probe_id
       |   AND ap.neighbor_id = ex.neighbor_id),
       |cnt AS (
       |  SELECT method, probe_id, count(*) AS n_returned,
       |         sum(hit) AS n_hit
       |  FROM j GROUP BY 1, 2),
       |sel AS (
       |  SELECT s.method AS method, s.probe_id AS probe_id,
       |         CAST(coalesce(c.n_returned, 0) AS BIGINT) AS n_returned,
       |         CAST(coalesce(c.n_hit, 0) AS BIGINT) AS n_hit,
       |         CAST(s.n_exact AS BIGINT) AS n_exact,
       |         round(coalesce(c.n_hit, 0) / s.n_exact, 4) AS recall
       |  FROM spine s LEFT JOIN cnt c
       |    ON s.method = c.method AND s.probe_id = c.probe_id)
       |SELECT * FROM sel""".stripMargin
  }

  /** Brute-force exact top-k in DuckDB — the baseline side of
    * [[recallReportSql]] (same score ladder and tiebreak as the
    * emb_ann_topk oracle: round(cos,9) DESC, neighbor_id). */
  def exactTopKSql(table: String, probeMaxId: Long, k: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM $table),
       |p AS (SELECT * FROM e WHERE vec_id < $probeMaxId),
       |c AS (SELECT * FROM e WHERE vec_id >= $probeMaxId),
       |s AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |         list_dot_product(p.v, c.v)
       |           / (sqrt(list_dot_product(p.v, p.v))
       |              * sqrt(list_dot_product(c.v, c.v))) AS cos_raw
       |  FROM p CROSS JOIN c),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |            ORDER BY round(cos_raw, 9) DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT probe_id, neighbor_id FROM r WHERE rank <= $k""".stripMargin

  /** [[exactTopKSql]] on the first `d` dimensions only — the DuckDB side
    * of the Matryoshka-truncation evaluation (`emb_ann_mrl`). */
  def truncTopKSql(table: String, probeMaxId: Long, k: Int, d: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, (embedding::DOUBLE[])[1:$d] AS v FROM $table),
       |p AS (SELECT * FROM e WHERE vec_id < $probeMaxId),
       |c AS (SELECT * FROM e WHERE vec_id >= $probeMaxId),
       |s AS (
       |  SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |         list_dot_product(p.v, c.v)
       |           / (sqrt(list_dot_product(p.v, p.v))
       |              * sqrt(list_dot_product(c.v, c.v))) AS cos_raw
       |  FROM p CROSS JOIN c),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |            ORDER BY round(cos_raw, 9) DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT probe_id, neighbor_id FROM r WHERE rank <= $k""".stripMargin
}
