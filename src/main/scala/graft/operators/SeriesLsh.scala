package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** LSH-blocked time-series similarity — the 100 TB scale path for the
  * all-pairs Pearson baseline (`q_ts_similarity`, B44).
  *
  * The baseline scores every series pair: quadratic in |series|, with
  * an in-plan guard that simply REFUSES above 100k series. This
  * operator replaces the pair generation with sign-random-projection
  * LSH (the hyperplane family of Charikar 2002, built here with
  * Rademacher ±1 components so every quantity stays an exact integer):
  *
  *  1. '''signs''' — component d of hyperplane i is
  *     `sgn(i,d) = ±1` from the engine-portable md5 hash32 of
  *     `"ts<i>|<day>"` — deterministic, reproducible, and expressible
  *     in ANSI SQL (so the DuckDB oracle mirrors it bit-for-bit);
  *  2. '''projections''' — Pearson correlation is cosine of the
  *     MEAN-CENTERED series, so the bit must be the sign of
  *     `<x - mean(x)·1, h_i>`. Multiplying by n keeps it integer:
  *     `bit_i = [n·proj_i - sx·S_i >= 0]` where `proj_i = Σ_d
  *     sgn(i,d)·x_d` (zero days contribute zero — computed from the
  *     SPARSE rows, one linear groupBy) and `S_i = Σ_spine sgn(i,d)`
  *     (a per-hyperplane constant from the tiny day spine);
  *  3. '''banding''' — `nBits` bits in bands of `bitsPerBand`; series
  *     sharing a band key are candidates (equi-join on (band, key),
  *     never an all-pairs product). Two series at correlation rho
  *     agree on one bit with probability 1 - arccos(rho)/pi, so a
  *     rho=0.95 pair survives 8 bands of 4 bits with P > 0.999;
  *  4. '''hot-bucket cap''' — buckets larger than `maxBucket` are
  *     dropped from pairing (the SimHash capped-bucket treatment: a
  *     bucket holding a constant-pattern crowd carries no
  *     discrimination, and the cap is what keeps within-bucket
  *     candidate growth linear at 100 TB);
  *  5. '''exact verify''' — candidates re-score with the SAME
  *     exact-integer Pearson as the baseline (n, Σx, Σx², Σxy all
  *     integers; only two sqrts and one divide round).
  *
  * Scale shape: one linear pass builds projections (nBits sums per
  * series, map-side combined), band rows are |series|×bands, the join
  * is an equi-join, and verification touches only candidates — with a
  * SPARSE dot (cnt_a·cnt_b over overlapping active days), so the
  * dense |series|×|days| grid the all-pairs baseline vectorizes is
  * never materialized. No stage is quadratic in |series| and none is
  * proportional to |series|×|spine|.
  */
object SeriesLsh {

  /** Cross-term products (n·sxy, sx_a·sx_b, n·sxx, sx²) are computed
    * in decimal(38,0): the DuckDB oracle promotes them to HUGEINT
    * (128-bit, exact), so a silent LongType wraparound on the Spark
    * side would be exactly the cross-engine drift the oracle pattern
    * exists to exclude. The LINEAR sums (sx, sxx, sxy, projections)
    * stay LongType for codegen speed — their contract is the per-series
    * magnitude bound Σcnt² < 2^63, far above any real daily-count
    * series; the decimal casts below make everything past the sums
    * exact at any magnitude the sums can legally reach. */
  private val dec = "decimal(38,0)"

  /** ±1 Rademacher component of hyperplane `i` at spine position
    * `day` — parity of the portable 32-bit md5 prefix. */
  private def sgn(i: Int, day: Column): Column =
    when(pmod(MinHash.hash32(concat(lit(s"ts$i|"), day.cast("string"))),
      lit(2L)) === 0L, lit(1L)).otherwise(lit(-1L))

  /** Correlated series pairs via sign-LSH candidates + exact Pearson
    * verify.
    *
    * @param daily     sparse series rows: (user_id, day: long, cnt: long);
    *                  missing days are zeros
    * @param threshold minimum Pearson correlation to emit
    * @return (user_a, user_b, corr round(4), n) — corr normalized with
    *         the `+ 0.0` negative-zero rule (SURVEY §6)
    */
  def correlatedPairs(daily: DataFrame, threshold: Double,
                      nBits: Int = 32, bitsPerBand: Int = 4,
                      maxBucket: Int = 1024): DataFrame = {
    require(nBits % bitsPerBand == 0, "bitsPerBand must divide nBits")
    val bands = nBits / bitsPerBand

    // The sparse series frame feeds three stages (spine bounds, the
    // projection pass, the verify grid) — checkpoint it so the
    // upstream aggregation runs ONCE (the q_yoy/KMeans house pattern).
    val d = daily.localCheckpoint()

    // Signs depend only on (hyperplane, day): materialize all nBits of
    // them on the TINY day spine (|days| x nBits md5 calls total) and
    // broadcast — never an md5 per data row.
    val bounds = d.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val days = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val daySigns = days.select(col("day") +:
      (0 until nBits).map(i => sgn(i, col("day")).as(s"__sg$i")): _*)
    val sCols = (0 until nBits).map(i => sum(col(s"__sg$i")).as(s"__s$i"))
    val spine = daySigns.agg(count(lit(1)).as("__n"), sCols: _*)

    // Linear pass: per-series moments + nBits projections, one groupBy
    // with map-side combine; zero days contribute zero to every sum.
    val projCols = (0 until nBits)
      .map(i => sum(col(s"__sg$i") * col("cnt")).as(s"__pr$i"))
    val moments = Seq(sum(col("cnt")).as("sx"),
      sum(col("cnt") * col("cnt")).as("sxx"))
    val aggCols = moments ++ projCols
    // |series| rows x ~nBits+4 cols, consumed by the band rows AND both
    // sides of the verify's moment joins — checkpoint so the wide
    // aggregation runs once.
    val stats = d.join(broadcast(daySigns), "day")
      .groupBy(col("user_id"))
      .agg(aggCols.head, aggCols.tail: _*)
      .crossJoin(broadcast(spine)) // 1-row scalar broadcast (PlanAudit)
      .localCheckpoint()

    // Band keys: key_b = sum_j bit_{b*k+j} << j, all integer math
    // (decimal cross-terms: DuckDB computes these in HUGEINT).
    def bandKey(b: Int): Column = (0 until bitsPerBand).map { j =>
      val i = b * bitsPerBand + j
      when(col("__n").cast(dec) * col(s"__pr$i")
          - col("sx").cast(dec) * col(s"__s$i") >= 0,
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    val bandRows = stats.select(col("user_id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"), bandKey(b).as("bkey"))): _*)).as("bk"))
      .select(col("user_id"), col("bk.band").as("band"),
        col("bk.bkey").as("bkey"))

    // Hot-bucket cap, then candidate pairs from the band equi-join.
    val capped = bandRows
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("bkey"))))
      .where(col("__bsz") <= maxBucket)
      .drop("__bsz")
    // Tiny (true near-pairs); consumed by the sparse dot AND the final
    // moment join — checkpoint so the band self-join runs once.
    val cands = capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.user_id") < col("y.user_id"))
      .select(col("x.user_id").as("user_a"), col("y.user_id").as("user_b"))
      .distinct()
      .localCheckpoint()

    // Exact-integer Pearson verify — identical math to the all-pairs
    // baseline, but only on candidates, and SPARSE: the dot product
    // sums cnt_a*cnt_b over the candidates' overlapping ACTIVE days
    // (zero days contribute zero), so the dense |series| x |days| grid
    // the baseline vectorizes is never materialized. Moments (n, sx,
    // sxx) come free from the projection pass.
    val da = d.select(col("user_id").as("user_a"), col("day"),
      col("cnt").as("__ca"))
    val db = d.select(col("user_id").as("user_b"), col("day"),
      col("cnt").as("__cb"))
    val sxy = cands.join(da, "user_a").join(db, Seq("user_b", "day"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(sum(col("__ca") * col("__cb")).as("sxy"))
    val ma = stats.select(col("user_id").as("user_a"), col("__n").as("n"),
      col("sx").as("sxa"), col("sxx").as("sxxa"))
    val mb = stats.select(col("user_id").as("user_b"),
      col("sx").as("sxb"), col("sxx").as("sxxb"))
    cands.join(sxy, Seq("user_a", "user_b"), "left")
      .na.fill(0L, Seq("sxy"))
      .join(ma, "user_a").join(mb, "user_b")
      .withColumn("num",
        col("n").cast(dec) * col("sxy") - col("sxa").cast(dec) * col("sxb"))
      .withColumn("dena",
        col("n").cast(dec) * col("sxxa") - col("sxa").cast(dec) * col("sxa"))
      .withColumn("denb",
        col("n").cast(dec) * col("sxxb") - col("sxb").cast(dec) * col("sxb"))
      .where(col("dena") > 0 && col("denb") > 0)
      .withColumn("corr_raw", col("num").cast("double") /
        (sqrt(col("dena").cast("double")) * sqrt(col("denb").cast("double"))))
      .where(col("corr_raw") >= threshold)
      .select(col("user_a"), col("user_b"),
        (round(col("corr_raw"), 4) + lit(0.0)).as("corr"), col("n"))
  }

  /** DuckDB mirror of [[correlatedPairs]] — generated from the SAME
    * constants, same md5-derived signs, same integer bit rule, same
    * cap, same exact Pearson. `dailySql` must define columns
    * (user_id, day, cnt) identical to the Spark input. */
  def correlatedPairsSql(dailySql: String, threshold: Double,
                         nBits: Int = 32, bitsPerBand: Int = 4,
                         maxBucket: Int = 1024): String = {
    require(nBits % bitsPerBand == 0, "bitsPerBand must divide nBits")
    // Caller fragment substituted AFTER stripMargin (single-pass), so a
    // multi-line dailySql whose continuation line starts with '|'/'||'
    // can't lose a pipe to this template's margin strip (ADVICE r8).
    graft.SqlTemplate.fill(s"""WITH d AS (
       |__DAILY__),
       |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
       |days AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b),
       |nn AS (SELECT count(*) AS n FROM days),
       |bits AS (SELECT unnest(generate_series(0, ${nBits - 1})) AS i),
       |sg AS (
       |  SELECT i, day,
       |    CASE WHEN (('0x' || substr(md5('ts' || i || '|' ||
       |      CAST(day AS VARCHAR)), 1, 8))::BIGINT % 2) = 0
       |    THEN 1 ELSE -1 END AS s
       |  FROM bits CROSS JOIN days),
       |sconst AS (SELECT i, sum(s) AS sb FROM sg GROUP BY 1),
       |proj AS (
       |  SELECT d.user_id, sg.i, sum(sg.s * d.cnt) AS pr
       |  FROM d JOIN sg ON sg.day = d.day GROUP BY 1, 2),
       |mom AS (
       |  SELECT user_id, sum(cnt) AS sx, sum(cnt*cnt) AS sxx
       |  FROM d GROUP BY 1),
       |bitval AS (
       |  SELECT p.user_id, p.i,
       |    CASE WHEN nn.n * p.pr - m.sx * sc.sb >= 0
       |      THEN 1 << (p.i % $bitsPerBand) ELSE 0 END AS w
       |  FROM proj p
       |  JOIN sconst sc USING (i) JOIN mom m USING (user_id)
       |  CROSS JOIN nn),
       |keys AS (
       |  SELECT user_id, i // $bitsPerBand AS band, sum(w) AS bkey
       |  FROM bitval GROUP BY 1, 2),
       |capped AS (
       |  SELECT * FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, bkey) AS bsz
       |    FROM keys) WHERE bsz <= $maxBucket),
       |cand AS (
       |  SELECT DISTINCT x.user_id AS user_a, y.user_id AS user_b
       |  FROM capped x JOIN capped y
       |    ON x.band = y.band AND x.bkey = y.bkey
       |    AND x.user_id < y.user_id),
       |sxyt AS (
       |  SELECT c.user_a, c.user_b, sum(da.cnt * db.cnt) AS sxy
       |  FROM cand c
       |  JOIN d da ON da.user_id = c.user_a
       |  JOIN d db ON db.user_id = c.user_b AND db.day = da.day
       |  GROUP BY 1, 2),
       |p AS (
       |  SELECT c.user_a, c.user_b, nn.n AS n, coalesce(s.sxy, 0) AS sxy,
       |         ma.sx AS sxa, mb.sx AS sxb, ma.sxx AS sxxa, mb.sxx AS sxxb
       |  FROM cand c
       |  LEFT JOIN sxyt s ON s.user_a = c.user_a AND s.user_b = c.user_b
       |  JOIN mom ma ON ma.user_id = c.user_a
       |  JOIN mom mb ON mb.user_id = c.user_b
       |  CROSS JOIN nn),
       |c2 AS (
       |  SELECT user_a, user_b, n,
       |         n*sxy - sxa*sxb AS num,
       |         n*sxxa - sxa*sxa AS dena,
       |         n*sxxb - sxb*sxb AS denb
       |  FROM p WHERE n*sxxa - sxa*sxa > 0 AND n*sxxb - sxb*sxb > 0)
       |SELECT user_a, user_b,
       |       round(CAST(num AS DOUBLE)
       |         / (sqrt(CAST(dena AS DOUBLE)) * sqrt(CAST(denb AS DOUBLE))), 4)
       |         + 0.0 AS corr,
       |       n
       |FROM c2
       |WHERE CAST(num AS DOUBLE)
       |  / (sqrt(CAST(dena AS DOUBLE)) * sqrt(CAST(denb AS DOUBLE)))
       |  >= $threshold""".stripMargin,
      "__DAILY__" -> dailySql)
  }
}
