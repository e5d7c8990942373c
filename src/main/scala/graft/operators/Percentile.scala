package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded-state percentile estimation — the 100 TB quantile path.
  *
  * Spark's exact `percentile` buffers every distinct (value, count)
  * pair per group inside ONE aggregation buffer; with few groups and
  * high-cardinality values (money columns), the per-group state at
  * 100 TB is a single-executor OOM, not a slow query. The classic
  * bounded-state alternative is a fixed-width histogram (the same
  * construction behind Postgres' `width_bucket` percentile recipes and
  * monitoring-system quantiles):
  *
  *  1. '''bucket''' — a scan-local integer division assigns each row's
  *     fixed-point value (e.g. cents) to a bucket of width `widthE`
  *     units; at any scale this is a projection, no state;
  *  2. '''count''' — `groupBy(group, bucket).count()` shuffles at most
  *     |groups| x |buckets| rows regardless of input size, with
  *     map-side partial aggregation (state per task = the histogram,
  *     bounded by construction — value_range / widthE buckets);
  *  3. '''interpolate''' — cumulative counts locate the bucket
  *     straddling rank p*n, and the estimate interpolates uniformly
  *     within it: `lo + width * (target - cum_before) / cnt`.
  *
  * The estimate shares a bucket with the order statistic at rank
  * ceil(p*n), so it is within `widthE` units of that true sample
  * quantile — choose the width to match the precision the consumer
  * needs (a $10 bucket for order totals bounds the p99 error at $10 on
  * a ~$500k range, with 60k buckets of state vs millions of distinct
  * values). Note the bound is against the ORDER STATISTIC, not the
  * linearly-interpolated percentile, which in sparse data may sit
  * between two far-apart sample values.
  *
  * Cross-engine determinism (SURVEY §6): bucket ids and counts are
  * exact integers in both engines; `p * n`, the straddle comparison,
  * and the final interpolation are the SAME double operands in the
  * same order, so IEEE agrees bitwise; output is round(4)-bounded with
  * the `+ 0.0` negative-zero guard. The DuckDB oracle is generated
  * from the same constants ([[histogramPercentileSql]]), so the two
  * engines cannot drift.
  */
object Percentile {

  /** Histogram-bucket percentile estimates per group.
    *
    * @param df       input frame
    * @param grpCol   group column name
    * @param fixedCol fixed-point (integer) value column, e.g. cents
    * @param widthE   bucket width in the same fixed-point units (> 0)
    * @param ps       percentiles in (0, 1], e.g. Seq(0.5, 0.9, 0.99)
    * @return one row per group: grp, n, and `p<pct>_hist` estimate
    *         columns in fixed-point units (round(4) doubles)
    *
    * Plan shape: scan-local bucket projection -> one partial-agg
    * shuffle of <= |groups| x |buckets| rows -> all remaining work
    * (window cum-sum, straddle filter, pivot) on the tiny histogram
    * frame. The ONLY full-data pass is stage 2's map-side combine.
    */
  def histogramPercentiles(df: DataFrame, grpCol: String, fixedCol: String,
                           widthE: Long, ps: Seq[Double]): DataFrame =
    percentilesFromDigest(histogramDigest(df, grpCol, fixedCol, widthE),
      widthE, ps)

  /** The (grp, b, cnt) histogram — the estimator's PERSISTABLE,
    * MERGEABLE digest (counts add: [[mergeDigests]]). At 100 TB each
    * partition/day/source materializes its ≤|groups|×|buckets|-row
    * digest once; any later union of scopes merges digests instead of
    * re-scanning — and the merge is an IDENTITY, not an approximation
    * (the `q_percentile_hist_merged` oracle proves it cross-engine). */
  def histogramDigest(df: DataFrame, grpCol: String, fixedCol: String,
                      widthE: Long): DataFrame = {
    require(widthE > 0, "bucket width must be positive")
    // `div` truncates toward zero, DuckDB `//` floors: identical for
    // the non-negative fixed-point values this operator contracts on.
    df.select(col(grpCol).as("grp"),
        expr(s"$fixedCol div $widthE").as("b"))
      .groupBy(col("grp"), col("b"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge histogram digests: bucket counts add. */
  def mergeDigests(digests: DataFrame*): DataFrame =
    digests.reduce(_ unionAll _)
      .groupBy(col("grp"), col("b")).agg(sum(col("cnt")).as("cnt"))

  /** Percentile estimates from a (grp, b, cnt) digest — the
    * interpolation stages of [[histogramPercentiles]]. */
  def percentilesFromDigest(hist: DataFrame, widthE: Long,
                            ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "percentiles must be in (0, 1]")
    require(ps.map(pColName).distinct.size == ps.size,
      s"percentile column names collide: ${ps.map(pColName).mkString(", ")}")
    val w = Window.partitionBy(col("grp")).orderBy(col("b"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("cum_before", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("grp"))))
    // One row per (group, p): the unique bucket with
    // cum_before < p*n <= cum; uniform interpolation inside it.
    val probes = explode(array(ps.map(lit): _*)).as("p")
    val est = cum.select(col("grp"), col("b"), col("cnt"), col("cum"),
        col("cum_before"), col("n"), probes)
      .withColumn("target", col("p") * col("n").cast("double"))
      .where(col("cum_before").cast("double") < col("target") &&
        col("target") <= col("cum").cast("double"))
      .withColumn("est",
        col("b").cast("double") * widthE + lit(widthE.toDouble) *
          (col("target") - col("cum_before").cast("double")) /
          col("cnt").cast("double"))
    val pivots = ps.map { p =>
      (round(max(when(col("p") === p, col("est"))), 4) + lit(0.0))
        .as(pColName(p))
    }
    est.groupBy(col("grp"))
      .agg(max(col("n")).as("n"), pivots: _*)
  }

  /** `p50_hist` / `p99_hist` / `p999_hist`-style column name for p.
    * The single-zero trim is ambiguous for some pairs (0.25 vs 0.025
    * both map to p25_hist), so [[percentilesFromDigest]] and
    * [[histogramPercentileSql]] require the mapped names be distinct
    * rather than silently producing duplicate output columns. */
  def pColName(p: Double): String = {
    val digits = (BigDecimal(p) * 1000).toBigInt.toString
    val trimmed = if (digits.endsWith("0")) digits.dropRight(1) else digits
    s"p${trimmed}_hist"
  }

  /** Bounded-state median absolute deviation — the 100 TB form of the
    * exact-percentile MAD (B43). Two histogram passes, each with
    * |groups| x |buckets| state: (1) the [[histogramPercentiles]]
    * median estimate per group (broadcast — |groups| rows); (2) a
    * histogram over `abs(value - med_est)`. Deviations are doubles, so
    * the second pass buckets by `floor(absdev / width)` — identical
    * operands in identical order on both engines, so the buckets (and
    * everything after) agree bitwise. Estimates carry the same
    * one-bucket-width bound as [[histogramPercentiles]], each vs its
    * own straddling order statistic. */
  def histogramMad(df: DataFrame, grpCol: String, fixedCol: String,
                   widthE: Long): DataFrame = {
    val med = histogramPercentiles(df, grpCol, fixedCol, widthE, Seq(0.5))
      .select(col("grp"), col(pColName(0.5)).as("med_est"))
    val dev = df.select(col(grpCol).as("grp"), col(fixedCol).as("__v"))
      .join(broadcast(med), "grp")
      .withColumn("absdev", abs(col("__v").cast("double") - col("med_est")))
    val hist = dev
      .select(col("grp"), col("med_est"),
        floor(col("absdev") / lit(widthE.toDouble)).cast("long").as("b"))
      .groupBy(col("grp"), col("med_est"), col("b"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("grp")).orderBy(col("b"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("cum_before", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("grp"))))
      .withColumn("target", lit(0.5) * col("n").cast("double"))
    cum
      .where(col("cum_before").cast("double") < col("target") &&
        col("target") <= col("cum").cast("double"))
      .select(col("grp"), col("n"),
        (round(col("med_est"), 4) + lit(0.0)).as("med_hist"),
        (round(col("b").cast("double") * widthE + lit(widthE.toDouble) *
          (col("target") - col("cum_before").cast("double")) /
          col("cnt").cast("double"), 4) + lit(0.0)).as("mad_hist"))
  }

  /** EXACT trimmed mean without a per-group full sort — the B39
    * reshape for few-and-huge groups (SURVEY §5). The windowed form
    * sorts each group in ONE reducer; this plan computes the SAME
    * answer (the oracle is the plain exact trimmed-mean SQL) from:
    *
    *  1. one histogram pass: per-(group, bucket) counts AND exact
    *     decimal value sums — |groups| x |buckets| state;
    *  2. cumulative counts locate, per group, the buckets straddling
    *     trim ranks k = n div 10 and n - k: buckets wholly below/above
    *     subtract wholesale via their precomputed sums — no row ever
    *     re-sorted;
    *  3. only the (at most two) BOUNDARY buckets per group are
    *     re-scanned and ranked — their size is bounded by the bucket
    *     width's occupancy, not the group, so the only windows in the
    *     plan run over tiny frames;
    *  4. kept sum = total − whole-bucket drops − boundary partials,
    *     all exact integers; the final divide matches the windowed
    *     form's operand order, so the result is bit-identical.
    */
  def histogramTrimmedMean(df: DataFrame, grpCol: String, fixedCol: String,
                           idCol: String, widthE: Long): DataFrame = {
    val dec = "decimal(38,0)"
    // Consumed by the histogram AND the boundary-bucket re-scan —
    // checkpoint so upstream joins/scans run once.
    val vals = df.select(col(grpCol).as("grp"), col(fixedCol).as("__v"),
        col(idCol).as("__id"))
      .withColumn("b", expr(s"__v div $widthE"))
      .localCheckpoint()
    val hist = vals.groupBy(col("grp"), col("b"))
      .agg(count(lit(1)).as("cnt"), sum(col("__v").cast(dec)).as("bsum"))
    val w = Window.partitionBy(col("grp")).orderBy(col("b"))
    val wg = Window.partitionBy(col("grp"))
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("cb", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(wg))
      .withColumn("total", sum(col("bsum")).over(wg))
      .withColumn("k", expr("n div 10"))
    val hi = col("n") - col("k")
    val bounds = cum.groupBy(col("grp")).agg(
      max(col("n")).as("n"), max(col("total")).as("total"),
      max(col("k")).as("k"),
      sum(when(col("cum") <= col("k"), col("bsum"))
        .otherwise(lit(0).cast(dec))).as("lowWhole"),
      sum(when(col("cb") >= hi, col("bsum"))
        .otherwise(lit(0).cast(dec))).as("highWhole"),
      max(when(col("cb") < col("k") && col("k") < col("cum"), col("b")))
        .as("bL"),
      max(when(col("cb") < col("k") && col("k") < col("cum"),
        col("k") - col("cb"))).as("needLow"),
      max(when(col("cb") < hi && hi < col("cum"), col("b"))).as("bH"),
      max(when(col("cb") < hi && hi < col("cum"), col("cum") - hi))
        .as("needHigh"))
    // Boundary buckets only: a broadcast-join filter keeps the frames
    // the windows run over bounded by bucket occupancy, not group size.
    val joined = vals.join(broadcast(bounds), "grp")
    val wLow = Window.partitionBy(col("grp"))
      .orderBy(col("__v").asc, col("__id").asc)
    val lowPart = joined.where(col("b") === col("bL"))
      .withColumn("r", row_number().over(wLow))
      .where(col("r") <= col("needLow"))
      .groupBy(col("grp")).agg(sum(col("__v").cast(dec)).as("lowPart"))
    val wHigh = Window.partitionBy(col("grp"))
      .orderBy(col("__v").desc, col("__id").desc)
    val highPart = joined.where(col("b") === col("bH"))
      .withColumn("r", row_number().over(wHigh))
      .where(col("r") <= col("needHigh"))
      .groupBy(col("grp")).agg(sum(col("__v").cast(dec)).as("highPart"))
    bounds
      .join(lowPart, Seq("grp"), "left").join(highPart, Seq("grp"), "left")
      .withColumn("keptSum",
        col("total") - col("lowWhole") - col("highWhole")
          - coalesce(col("lowPart"), lit(0).cast(dec))
          - coalesce(col("highPart"), lit(0).cast(dec)))
      .withColumn("n_kept", col("n") - lit(2) * col("k"))
      .select(col("grp"), col("n_kept"),
        round(col("keptSum").cast("double") / col("n_kept") / lit(100.0), 4)
          .as("trimmed_mean"))
  }

  /** DuckDB mirror of [[histogramMad]] — same two-stage construction
    * from the same constants. */
  def histogramMadSql(table: String, grpExpr: String, fixedExpr: String,
                      widthE: Long): String = {
    val medSql = histogramPercentileSql(table, grpExpr, fixedExpr, widthE,
      Seq(0.5))
    // fragments substituted post-stripMargin, single pass (ADVICE r8)
    graft.SqlTemplate.fill(s"""WITH medq AS (
       |__MEDQ__),
       |vals2 AS (
       |  SELECT __GRP__ AS grp, __FIXED__ AS v FROM __TABLE__),
       |dev AS (
       |  SELECT d.grp, m.${pColName(0.5)} AS med_est,
       |         abs(CAST(d.v AS DOUBLE) - m.${pColName(0.5)}) AS absdev
       |  FROM vals2 d JOIN medq m USING (grp)),
       |h2 AS (
       |  SELECT grp, med_est,
       |         CAST(floor(absdev / CAST($widthE AS DOUBLE)) AS BIGINT) AS b,
       |         count(*) AS cnt
       |  FROM dev GROUP BY 1, 2, 3),
       |c2 AS (
       |  SELECT grp, med_est, b, cnt,
       |         sum(cnt) OVER (PARTITION BY grp ORDER BY b) AS cum,
       |         sum(cnt) OVER (PARTITION BY grp ORDER BY b) - cnt
       |           AS cum_before,
       |         sum(cnt) OVER (PARTITION BY grp) AS n
       |  FROM h2)
       |SELECT grp, CAST(n AS BIGINT) AS n,
       |  round(med_est, 4) + 0.0 AS med_hist,
       |  round(CAST(b AS DOUBLE) * $widthE + CAST($widthE AS DOUBLE) *
       |    (CAST(0.5 AS DOUBLE) * CAST(n AS DOUBLE) - CAST(cum_before AS DOUBLE))
       |    / CAST(cnt AS DOUBLE), 4) + 0.0 AS mad_hist
       |FROM c2
       |WHERE CAST(cum_before AS DOUBLE) < CAST(0.5 AS DOUBLE) * CAST(n AS DOUBLE)
       |  AND CAST(0.5 AS DOUBLE) * CAST(n AS DOUBLE) <= CAST(cum AS DOUBLE)""".stripMargin,
      "__MEDQ__" -> medSql, "__GRP__" -> grpExpr,
      "__FIXED__" -> fixedExpr, "__TABLE__" -> table)
  }

  /** DuckDB mirror of [[histogramPercentiles]] — generated from the
    * SAME width/percentile constants so the engines cannot drift.
    * `fixedExpr` must produce the identical integer fixed-point values
    * as the Spark `fixedCol`. */
  def histogramPercentileSql(table: String, grpExpr: String,
                             fixedExpr: String, widthE: Long,
                             ps: Seq[Double]): String = {
    require(ps.map(pColName).distinct.size == ps.size,
      s"percentile column names collide: ${ps.map(pColName).mkString(", ")}")
    val pList = ps.map(p => s"CAST($p AS DOUBLE)").mkString(", ")
    val pivots = ps.map { p =>
      s"round(max(CASE WHEN p = CAST($p AS DOUBLE) THEN est END), 4) + 0.0 AS ${pColName(p)}"
    }.mkString(",\n|  ")
    graft.SqlTemplate.fill(s"""WITH vals AS (
       |  SELECT __GRP__ AS grp, __FIXED__ AS v FROM __TABLE__),
       |hist AS (
       |  SELECT grp, v // $widthE AS b, count(*) AS cnt
       |  FROM vals GROUP BY 1, 2),
       |cum AS (
       |  SELECT grp, b, cnt,
       |         sum(cnt) OVER (PARTITION BY grp ORDER BY b) AS cum,
       |         sum(cnt) OVER (PARTITION BY grp ORDER BY b) - cnt
       |           AS cum_before,
       |         sum(cnt) OVER (PARTITION BY grp) AS n
       |  FROM hist),
       |est AS (
       |  SELECT grp, n, p,
       |         CAST(b AS DOUBLE) * $widthE + CAST($widthE AS DOUBLE) *
       |           (p * CAST(n AS DOUBLE) - CAST(cum_before AS DOUBLE))
       |           / CAST(cnt AS DOUBLE) AS est
       |  FROM cum CROSS JOIN (SELECT unnest([$pList]) AS p) ps
       |  WHERE CAST(cum_before AS DOUBLE) < p * CAST(n AS DOUBLE)
       |    AND p * CAST(n AS DOUBLE) <= CAST(cum AS DOUBLE))
       |SELECT grp, CAST(max(n) AS BIGINT) AS n,
       |  ${pivots}
       |FROM est GROUP BY grp""".stripMargin,
      "__GRP__" -> grpExpr, "__FIXED__" -> fixedExpr, "__TABLE__" -> table)
  }
}
