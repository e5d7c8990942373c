package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine trainable quality filter — full-batch gradient-descent
  * logistic regression over scan-local document features, trained and
  * applied without leaving the engine (the "model-based quality
  * filtering" step of a training-data pipeline, but with the model fit
  * *inside* the same declarative plan that scores with it).
  *
  * Determinism is the whole design (SURVEY.md §6): every quantity that
  * crosses a parallel reduction is an exact integer —
  *  - features snap to e9-scaled BIGINTs at the scan (the only float ops
  *    before snapping — sqrt, divide — are IEEE-correctly-rounded, so
  *    both engines produce identical doubles to round);
  *  - the link is the FAST sigmoid `0.5 + 0.5·m/(1+|m|)`, not
  *    `1/(1+exp(−m))`: no transcendental anywhere, so the margin→score
  *    path is bit-identical across engines (+,×,÷,abs are IEEE-exact);
  *  - per-row gradient terms are e9×e9 = e18-scaled 128-bit integer
  *    products, summed exactly (order-independent, any partitioning);
  *  - the weight STATE is e12-scaled integers, and the update
  *    lr·(g/1e18)/n = lrE6·g / (1e12·n) on the e12 ladder is an exact
  *    RATIONAL of integers, rounded half-away-from-zero in pure
  *    integer arithmetic — no float ever touches the weight path, so
  *    the two engines cannot disagree even when an update lands
  *    exactly on a rounding boundary (a double-then-round snap
  *    straddled one at sf0.001: engines' double-rounding rules differ
  *    at half boundaries, and snapped-decimal GD CONCENTRATES values
  *    on them — r10).
  *
  * Scale shape: each iteration is ONE partial-agg scan of the cached
  * feature frame (3 gradient sums — map-side combine, 3 longs per
  * partition reach the driver); the weight vector is d+1 doubles on the
  * driver (the KMeans-cost-scalar class, [[KMeans]]). At 100 TB the
  * feature frame is the only big thing and it never shuffles — gradient
  * aggregation is a tree reduction, and scoring is scan-local.
  *
  * The DuckDB oracle ([[oracleSql]]) unrolls the K iterations into
  * nested CTEs computing the SAME e18-exact sums and 12-decimal weight
  * updates — cross-engine agreement is exact, not approximate.
  */
object LogReg {

  /** Learning rate — a literal in both engines' arithmetic. */
  val LearnRate = 0.5

  /** Full-batch GD iterations (unrolled in the SQL oracle). */
  val Iters = 3

  /** e9-snapped features + weak label from the documents table:
    * x0 = bias, x1 = capped sqrt(n_chars)/100 (length, compressive),
    * x2 = space fraction of text (word-structure proxy);
    * y = 1 iff lang = 'en' (the weak label the filter distills).
    */
  def featurize(docs: DataFrame): DataFrame = {
    val len = length(col("text"))
    val spaceFrac = when(len > 0,
      (len - length(expr("replace(text, ' ', '')"))).cast("double")
        / len.cast("double")).otherwise(lit(0.0))
    docs.select(
      col("source"),
      when(col("lang") === "en", 1L).otherwise(0L).as("y"),
      lit(1000000000L).as("x0_e9"),
      round(least(sqrt(col("n_chars").cast("double")), lit(1000.0))
        .divide(lit(100.0)) * lit(1000000000.0)).cast("long").as("x1_e9"),
      round(spaceFrac * lit(1000000000.0)).cast("long").as("x2_e9"))
  }

  /** Fast-sigmoid score on the e9 ladder for a given weight vector:
    * p_e9 = round((0.5 + 0.5·m/(1+|m|))·1e9) with
    * m = Σ wj·(xj_e9/1e9). Parenthesization mirrors the oracle SQL
    * exactly — IEEE ops on identical operands in identical order. */
  def pE9(w: Array[Double]): Column = {
    val m = (lit(w(0)) * (col("x0_e9") / lit(1.0e9))
      + lit(w(1)) * (col("x1_e9") / lit(1.0e9)))
      .plus(lit(w(2)) * (col("x2_e9") / lit(1.0e9)))
    val p = lit(0.5) + (lit(0.5) * m) / (lit(1.0) + abs(m))
    round(p * lit(1.0e9)).cast("long")
  }

  /** lr as the exact rational lrE6/1e6 (0.5 → 500000/1e6). */
  private def lrE6(lr: Double): Long = math.round(lr * 1.0e6)

  /** K full-batch GD steps from w = 0. `feat` should be cached by the
    * caller — each iteration is one aggregate scan over it. Weight
    * state lives on the e12 integer ladder; each update subtracts
    * round_half_away(lrE6·g / (1e12·n)) computed in exact integer
    * arithmetic (mirrored verbatim by the oracle's HUGEINT CTEs). */
  def train(feat: DataFrame, lr: Double = LearnRate,
            iters: Int = Iters): Array[Double] = {
    val n = feat.count()
    val rate = BigInt(lrE6(lr))
    val den = BigInt(1000000000000L) * n
    var wE12 = Array(0L, 0L, 0L)
    for (_ <- 1 to iters) {
      val w = wE12.map(_.toDouble / 1.0e12)
      val err = (pE9(w) - col("y") * lit(1000000000L)).cast("decimal(19,0)")
      val row = feat.agg(
        sum(err * col("x0_e9").cast("decimal(19,0)")).as("g0"),
        sum(err * col("x1_e9").cast("decimal(19,0)")).as("g1"),
        sum(err * col("x2_e9").cast("decimal(19,0)")).as("g2")).head()
      wE12 = wE12.indices.map { j =>
        val num = rate * BigInt(row.getDecimal(j).toBigInteger)
        val q = (num.abs * 2 + den) / (den * 2)
        wE12(j) - (q * num.signum).toLong
      }.toArray
    }
    wE12.map(_.toDouble / 1.0e12)
  }

  /** Per-source quality report under the trained model: doc counts,
    * docs flagged low-quality (p < 0.5), and the exact sum of e9
    * scores (the order-independent "average quality" numerator). */
  def scoreBySource(feat: DataFrame, w: Array[Double]): DataFrame =
    feat.withColumn("p_e9", pE9(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("p_e9") < 500000000L, 1)).as("n_flagged"),
        sum(col("p_e9")).as("sum_p_e9"))
      .orderBy("source")

  /** Calibration / reliability report (C112) — the deploy gate for the
    * trained filter: bucket the corpus by predicted-score decile and
    * compare each bucket's predicted mass (`mean_p_e4`) with its
    * OBSERVED label rate (`pos_frac_e4`). A well-calibrated filter has
    * the two tracking; divergence says the score can't be thresholded
    * at face value (pick the threshold from this table, not from 0.5).
    * Bins are FIXED e4-granularity value buckets (min(p_e9 div 1e5,
    * 9999)) — scan-local at any corpus size, unlike rank-deciles whose
    * global ntile would sort the corpus; empty bins are informative
    * (scores never land there), and the fine grain matters because the
    * fast-sigmoid scores of a weak-feature model CONCENTRATE (percent
    * bins collapsed this corpus into one row). All integer ladders —
    * nothing float crosses the engine boundary. One scan-local pass
    * over the cached feature frame + a ≤10⁴-row agg. */
  def calibrationReport(feat: DataFrame, w: Array[Double]): DataFrame =
    feat.withColumn("p_e9", pE9(w))
      .withColumn("bucket", least(expr("p_e9 div 100000"), lit(9999L)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("y")).as("n_pos"),
        sum(col("p_e9")).as("sum_p_e9"))
      .withColumn("pos_frac_e4", expr("(10000 * n_pos) div n_docs"))
      .withColumn("mean_p_e4", expr("(sum_p_e9 div n_docs) div 100000"))
      .orderBy("bucket")

  /** The trained weights themselves on the e12 ladder — a single-row
    * frame proving the cross-engine bit-equality of the training loop,
    * not just of the downstream report. */
  def modelRow(spark: org.apache.spark.sql.SparkSession,
               w: Array[Double]): DataFrame = {
    import spark.implicits._
    Seq((e12(w(0)), e12(w(1)), e12(w(2))))
      .toDF("w0_e12", "w1_e12", "w2_e12")
  }

  private def e12(x: Double): Long = math.round(x * 1.0e12)

  // ---------------------------------------------------------------- oracle

  private val featCte =
    """f AS (
      |  SELECT source,
      |    CASE WHEN lang = 'en' THEN CAST(1 AS BIGINT)
      |         ELSE CAST(0 AS BIGINT) END AS y,
      |    CAST(1000000000 AS BIGINT) AS x0_e9,
      |    CAST(round((least(sqrt(CAST(n_chars AS DOUBLE)), 1000.0) / 100.0)
      |         * 1000000000.0) AS BIGINT) AS x1_e9,
      |    CAST(round((CASE WHEN length(text) > 0
      |          THEN CAST(length(text) - length(replace(text, ' ', ''))
      |               AS DOUBLE) / CAST(length(text) AS DOUBLE)
      |          ELSE 0.0 END) * 1000000000.0) AS BIGINT) AS x2_e9
      |  FROM documents),
      |cnt AS (SELECT count(*) AS n FROM f),
      |w0 AS (SELECT CAST(0 AS BIGINT) AS w0_e12, CAST(0 AS BIGINT) AS w1_e12,
      |              CAST(0 AS BIGINT) AS w2_e12)""".stripMargin

  /** The weights as doubles for the margin (the only float op on the
    * weight path — same division both engines, bit-identical). */
  private def mSql(wCte: String): String =
    s"""(SELECT f.*,
       |          ((CAST(w0_e12 AS DOUBLE) / 1.0e12)
       |            * (CAST(x0_e9 AS DOUBLE) / 1000000000.0)
       |           + (CAST(w1_e12 AS DOUBLE) / 1.0e12)
       |            * (CAST(x1_e9 AS DOUBLE) / 1000000000.0))
       |           + (CAST(w2_e12 AS DOUBLE) / 1.0e12)
       |            * (CAST(x2_e9 AS DOUBLE) / 1000000000.0) AS m
       |        FROM f, $wCte) q""".stripMargin

  /** Score + gradient CTEs for iteration k (reads weight CTE w{k-1}).
    * The weight update is EXACT integer arithmetic: delta_e12 =
    * round_half_away(lrE6·g / (1e12·n)) over HUGEINTs — mirrors
    * [[train]]'s BigInt update verbatim. */
  private def iterCtes(k: Int, lr: Double): String = {
    val prev = s"w${k - 1}"
    val rate = lrE6(lr)
    def upd(j: Int): String =
      s"""w${j}_e12 - CAST(CASE WHEN g$j >= 0
         |      THEN ((CAST($rate AS HUGEINT) * g$j) * 2 + den) // (den * 2)
         |      ELSE -(((CAST($rate AS HUGEINT) * -g$j) * 2 + den) // (den * 2))
         |      END AS BIGINT) AS w${j}_e12""".stripMargin
    s"""p$k AS (
       |  SELECT q.*, CAST(round((0.5 + (0.5 * m) / (1.0 + abs(m)))
       |         * 1000000000.0) AS BIGINT) AS p_e9
       |  FROM ${mSql(prev)}),
       |g$k AS (
       |  SELECT sum(CAST(p_e9 - y * 1000000000 AS HUGEINT)
       |             * CAST(x0_e9 AS HUGEINT)) AS g0,
       |         sum(CAST(p_e9 - y * 1000000000 AS HUGEINT)
       |             * CAST(x1_e9 AS HUGEINT)) AS g1,
       |         sum(CAST(p_e9 - y * 1000000000 AS HUGEINT)
       |             * CAST(x2_e9 AS HUGEINT)) AS g2
       |  FROM p$k),
       |w$k AS (
       |  SELECT
       |    ${upd(0)},
       |    ${upd(1)},
       |    ${upd(2)}
       |  FROM g$k, $prev,
       |    (SELECT CAST(1000000000000 AS HUGEINT)
       |       * (SELECT n FROM cnt) AS den) d$k)""".stripMargin
  }

  private def trainedCtes(iters: Int, lr: Double): String =
    (featCte +: (1 to iters).map(iterCtes(_, lr))).mkString(",\n")

  /** DuckDB twin of featurize→train→scoreBySource, iterations unrolled. */
  def oracleSql(iters: Int = Iters, lr: Double = LearnRate): String =
    s"""WITH
       |${trainedCtes(iters, lr)},
       |scored AS (
       |  SELECT q.source, CAST(round((0.5 + (0.5 * m) / (1.0 + abs(m)))
       |         * 1000000000.0) AS BIGINT) AS p_e9
       |  FROM ${mSql(s"w$iters")})
       |SELECT source, count(*) AS n_docs,
       |       count(*) FILTER (WHERE p_e9 < 500000000) AS n_flagged,
       |       CAST(sum(p_e9) AS BIGINT) AS sum_p_e9
       |FROM scored GROUP BY source ORDER BY source""".stripMargin

  /** DuckDB twin of featurize→train→calibrationReport. */
  def calibrationOracleSql(iters: Int = Iters,
                           lr: Double = LearnRate): String =
    s"""WITH
       |${trainedCtes(iters, lr)},
       |scored AS (
       |  SELECT q.y, CAST(round((0.5 + (0.5 * m) / (1.0 + abs(m)))
       |         * 1000000000.0) AS BIGINT) AS p_e9
       |  FROM ${mSql(s"w$iters")}),
       |b AS (
       |  SELECT least(p_e9 // 100000, 9999) AS bucket,
       |         count(*) AS n_docs,
       |         CAST(sum(y) AS BIGINT) AS n_pos,
       |         CAST(sum(p_e9) AS BIGINT) AS sum_p_e9
       |  FROM scored GROUP BY 1)
       |SELECT bucket, n_docs, n_pos, sum_p_e9,
       |  CAST((10000 * n_pos) // n_docs AS BIGINT) AS pos_frac_e4,
       |  CAST((sum_p_e9 // n_docs) // 100000 AS BIGINT) AS mean_p_e4
       |FROM b ORDER BY bucket""".stripMargin

  /** DuckDB twin of the trained weight vector on the e12 ladder
    * (the weight state IS e12 integers — emitted directly). */
  def modelOracleSql(iters: Int = Iters, lr: Double = LearnRate): String =
    s"""WITH
       |${trainedCtes(iters, lr)}
       |SELECT w0_e12, w1_e12, w2_e12
       |FROM w$iters""".stripMargin
}
