package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic HyperLogLog distinct-count — an oracle-backable
  * sketch (Flajolet et al. 2007).
  *
  * Spark's `approx_count_distinct` is a fine operational HLL, but its
  * xxHash64-based register math is engine-specific: no cross-engine
  * oracle can replay it. This HLL is built ENTIRELY from the repo's
  * portable primitives, so the DuckDB oracle computes the identical
  * sketch from generated SQL (the MinHash-oracle pattern):
  *
  *  - '''hash''' — the 32-bit md5 prefix ([[MinHash.hash32]]); low
  *    `log2(m)` bits pick the register, the remaining 26 bits feed the
  *    rank (leading-zero count + 1, an integer CASE ladder generated
  *    from the same constants in both engines — never floating log2);
  *  - '''registers''' — `groupBy(idx).agg(max(rank))`: one partial-agg
  *    shuffle whose per-task state is m longs, REGARDLESS of input
  *    size — this is the whole point of HLL at 100 TB (B14);
  *  - '''harmonic sum''' — ranks are ≤ 27, so `Σ 2^(-M_j)` scaled by
  *    2^27 is `Σ 1 << (27 - M_j)`: an EXACT integer (≤ m·2^27 ≪ 2^53).
  *    The only floating-point step is the final
  *    `alpha · m² · 2^27 / denom` — one multiply-divide chain over
  *    exact integers, bitwise identical in both engines. No
  *    transcendentals cross the engine boundary (SURVEY §6): the
  *    small-range linear-counting correction needs `ln`, so it is
  *    deliberately NOT applied; callers get the raw estimator plus the
  *    zero-register count to apply their own correction. With m=64 the
  *    correction zone ends at ~160 distinct — below that, prefer exact
  *    counting anyway.
  *
  * Standard error is ~1.04/sqrt(m) (m=64 → ~13%).
  */
object Hll {

  /** alpha_m bias constants from the HLL paper (m = 16/32/64). */
  private def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m)
  }

  /** Bits left in the 32-bit hash after the low log2(m) index bits are
    * shifted off — the width of v, hence the rank-ladder depth. For
    * m = 64 this is 26 (ranks 1..27); deriving it from m keeps the
    * estimator unbiased for every supported m, not just 64. Same
    * constants feed both the Spark `when` ladder and the SQL CASE:
    * bitlen(v) = k iff 2^(k-1) <= v < 2^k, rank = bits+1 - bitlen
    * (v = 0 -> bits+1). */
  private def rankBits(m: Int): Int = 32 - Integer.numberOfTrailingZeros(m)

  /** One-row sketch summary: est_hll (round-4 double), v_zero (empty
    * registers), denom_e27 (the exact scaled harmonic sum — the full
    * register-state digest an incremental merge would persist). */
  def distinctEstimate(df: DataFrame, keyCol: Column, m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    estimateFromRegisters(registers(df, keyCol, m), m)
  }

  /** Scan-local (idx, rank) sketch columns for a key — the shared
    * per-row step of every HLL form here. */
  private def idxRank(keyCol: Column, m: Int): (Column, Column) = {
    val bits = rankBits(m)
    val h = MinHash.hash32(keyCol.cast("string"))
    val idx = pmod(h, lit(m.toLong))
    val v = shiftright(h, Integer.numberOfTrailingZeros(m))
    // Integer leading-zero ladder. The fold wraps later iterations
    // OUTERMOST, so ascend k: the highest threshold (k = bits) must be
    // the first condition evaluated, matching the SQL CASE order.
    val rank = (1 to bits).foldLeft(lit(bits + 1): Column) {
      (acc, k) => when(v >= (1L << (k - 1)), lit(bits + 1 - k)).otherwise(acc)
    }
    (idx, rank.cast("long"))
  }

  /** Per-GROUP distinct estimate — the `COUNT(DISTINCT x) GROUP BY y`
    * shape, which at scale is otherwise a full shuffle of every
    * (group, key) pair. State: m longs per group per task. Absent
    * registers are accounted ALGEBRAICALLY (each contributes 2^27 to
    * the scaled harmonic sum and one zero register) instead of
    * materializing a per-group register spine. */
  def groupedDistinctEstimate(df: DataFrame, grpCol: String,
                              keyCol: Column, m: Int = 64): DataFrame =
    estimateFromGroupedRegisters(groupedRegisters(df, grpCol, keyCol, m), m)

  /** The per-(group, register) max-rank digest. Works on BATCH and
    * STREAMING frames alike: max is a monotone streaming aggregate,
    * so on a stream this runs in complete/update output mode with
    * ≤ m rows of state per group — bounded BY CONSTRUCTION, no
    * watermark needed; that is the whole point of sketches over
    * unbounded feeds (the A24 feed-health companion: live distinct
    * users per pipeline). HllSpec pins stream ≡ batch digest parity. */
  def groupedRegisters(df: DataFrame, grpCol: String, keyCol: Column,
                       m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val (idx, rank) = idxRank(keyCol, m)
    df.select(col(grpCol).as("grp"), idx.as("idx"), rank.as("rank"))
      .groupBy(col("grp"), col("idx")).agg(max(col("rank")).as("mj"))
  }

  /** Per-group estimates from a [[groupedRegisters]] digest. */
  def estimateFromGroupedRegisters(regs: DataFrame, m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val bits = rankBits(m)
    val unit = 1L << (bits + 1)
    regs
      .groupBy(col("grp"))
      .agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${bits + 1} - mj AS INT))"))
          .as("__dp"),
        count(lit(1)).as("__np"),
        sum(when(col("mj") === 0L, 1L).otherwise(0L)).as("__zp"))
      .select(col("grp"),
        (round(lit(alpha(m)) * lit(m.toDouble * m) * lit(math.pow(2, bits + 1))
          / (col("__dp") + (lit(m.toLong) - col("__np")) * unit).cast("double"),
          4) + lit(0.0)).as("est_hll"),
        (col("__zp") + lit(m.toLong) - col("__np")).as("v_zero"),
        (col("__dp") + (lit(m.toLong) - col("__np")) * unit).as("denom_e27"))
  }

  /** DuckDB mirror of [[groupedDistinctEstimate]]. */
  def groupedDistinctEstimateSql(table: String, grpExpr: String,
                                 keyExpr: String, m: Int = 64): String = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val bits = rankBits(m)
    val shift = Integer.numberOfTrailingZeros(m)
    val ladder = (bits to 1 by -1)
      .map(k => s"WHEN v >= ${1L << (k - 1)} THEN ${bits + 1 - k}")
      .mkString("\n|      ")
    val scale = (1L << (bits + 1)).toDouble
    val unit = 1L << (bits + 1)
    // DuckDB types sum()-derived integers HUGEINT, which the driver
    // stringifies with a trailing `.0` unlike Spark's BIGINT — every
    // integer output must be CAST(... AS BIGINT) (SURVEY §6).
    // Caller-supplied fragments are substituted AFTER stripMargin (a
    // multi-line subquery whose continuation line begins with '||'
    // must not lose a pipe to this template's margin strip) and in a
    // SINGLE pass (a fragment containing a placeholder-shaped token
    // must not be re-expanded — ADVICE r8).
    graft.SqlTemplate.fill(s"""WITH h AS (
       |  SELECT __GRP__ AS grp,
       |    ('0x' || substr(md5(CAST(__KEY__ AS VARCHAR)), 1, 8))::BIGINT AS hv
       |  FROM __TABLE__),
       |r AS (
       |  SELECT grp, hv % $m AS idx, hv >> $shift AS v FROM h),
       |rk AS (
       |  SELECT grp, idx,
       |    CASE
       |      $ladder
       |      ELSE ${bits + 1} END AS rank
       |  FROM r),
       |regs AS (
       |  SELECT grp, idx, max(rank) AS mj FROM rk GROUP BY 1, 2),
       |agg AS (
       |  SELECT grp,
       |    sum(1::BIGINT << (${bits + 1} - mj)) AS dp,
       |    count(*) AS np,
       |    sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS zp
       |  FROM regs GROUP BY 1)
       |SELECT grp,
       |  round(CAST(${alpha(m)} AS DOUBLE) * CAST(${m.toDouble * m} AS DOUBLE)
       |    * CAST($scale AS DOUBLE)
       |    / CAST(dp + ($m - np) * $unit AS DOUBLE), 4) + 0.0 AS est_hll,
       |  CAST(zp + $m - np AS BIGINT) AS v_zero,
       |  CAST(dp + ($m - np) * $unit AS BIGINT) AS denom_e27
       |FROM agg""".stripMargin,
      "__TABLE__" -> table, "__GRP__" -> grpExpr, "__KEY__" -> keyExpr)
  }

  /** The m-row register table (idx, mj) — the sketch's PERSISTABLE,
    * MERGEABLE digest. At 100 TB this is the operational shape: each
    * partition/day/source materializes its m-row digest once, and any
    * later union of scopes is [[mergeRegisters]] (a per-register max)
    * — never a re-scan. Missing registers are zero-filled, so two
    * digests always align row-for-row. */
  def registers(df: DataFrame, keyCol: Column, m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val (idx, rank) = idxRank(keyCol, m)
    val regs = df.select(idx.as("idx"), rank.as("rank"))
      .groupBy(col("idx")).agg(max(col("rank")).as("mj"))
    val spine = df.sparkSession.range(m).select(col("id").as("idx"))
    spine.join(regs, Seq("idx"), "left").na.fill(0L, Seq("mj"))
  }

  /** Merge register digests: per-register max. HLL's merge is EXACT —
    * registers(a union b) = merge(registers(a), registers(b)) hold as
    * an identity, not an approximation — so sketching distributes over
    * any partitioning of the data (HllSpec pins the identity; the
    * `q_hll_merge` oracle proves it cross-engine). */
  def mergeRegisters(digests: DataFrame*): DataFrame =
    digests.reduce(_ unionAll _)
      .groupBy(col("idx")).agg(max(col("mj")).as("mj"))

  /** Collapse a [[groupedRegisters]] digest across ALL its groups into
    * one zero-filled m-row register table. The per-register max over
    * groups IS [[mergeRegisters]] applied to the per-group digests —
    * but when the scopes being merged live in one table (shards, days,
    * sources), deriving them via `groupedRegisters` costs ONE scan
    * where building each scope's [[registers]] frame separately
    * re-scans per scope. */
  def mergeGroupedRegisters(regs: DataFrame, m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val merged = regs.groupBy(col("idx")).agg(max(col("mj")).as("mj"))
    val spine = regs.sparkSession.range(m).select(col("id").as("idx"))
    spine.join(merged, Seq("idx"), "left").na.fill(0L, Seq("mj"))
  }

  /** Distinct-overlap (audience-overlap) estimate between two scopes
    * in ONE scan: |A∩B| = est(A) + est(B) − est(A∪B) by
    * inclusion-exclusion over three register columns built in a single
    * m-row aggregation — `max(rank) FILTER (scope)` per register — so
    * the scan, shuffle, and state cost is that of one sketch, not
    * three. Rows may satisfy both predicates (scopes need not
    * partition the input).
    *
    * Output (one row): `est_a`, `est_b`, `est_union`, `est_overlap` —
    * round-4 doubles; the overlap is computed FROM the already-rounded
    * component estimates (sum/difference of round-4 doubles, identical
    * IEEE in both engines, re-rounded). Sketch error compounds ~3× for
    * the difference, and a small TRUE overlap can estimate slightly
    * negative — that is honest sketch behavior, deliberately not
    * clamped. Registers absent for a scope are accounted algebraically
    * via `coalesce(mj, 0)`; registers absent entirely add
    * `(m − present) · 2^(bits+1)` to every denominator. */
  def overlapEstimate(df: DataFrame, inA: Column, inB: Column,
                      keyCol: Column, m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val bits = rankBits(m)
    val unit = 1L << (bits + 1)
    val (idx, rank) = idxRank(keyCol, m)
    val regs = df.select(inA.as("a"), inB.as("b"), idx.as("idx"),
        rank.as("rank"))
      .where(col("a") || col("b"))
      .groupBy(col("idx"))
      .agg(max(when(col("a"), col("rank"))).as("ma"),
        max(when(col("b"), col("rank"))).as("mb"),
        max(col("rank")).as("mu"))
    def dp(c: String): Column =
      (coalesce(sum(expr(
        s"shiftleft(CAST(1 AS BIGINT), CAST(${bits + 1} - coalesce($c, 0) AS INT))")),
        lit(0L)) + (lit(m.toLong) - count(lit(1))) * unit)
    def est(denom: Column): Column =
      round(lit(alpha(m)) * lit(m.toDouble * m) * lit(math.pow(2, bits + 1))
        / denom.cast("double"), 4) + lit(0.0)
    regs
      .agg(dp("ma").as("__da"), dp("mb").as("__db"), dp("mu").as("__du"))
      .select(est(col("__da")).as("est_a"), est(col("__db")).as("est_b"),
        est(col("__du")).as("est_union"))
      .select(col("est_a"), col("est_b"), col("est_union"),
        (round(col("est_a") + col("est_b") - col("est_union"), 4) + lit(0.0))
          .as("est_overlap"))
  }

  /** DuckDB mirror of [[overlapEstimate]] — same hash, ladder,
    * FILTER-style register maxes, exact integer denominators, and the
    * same rounded-components overlap arithmetic. */
  def overlapEstimateSql(table: String, aExpr: String, bExpr: String,
                         keyExpr: String, m: Int = 64): String = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val bits = rankBits(m)
    val shift = Integer.numberOfTrailingZeros(m)
    val ladder = (bits to 1 by -1)
      .map(k => s"WHEN v >= ${1L << (k - 1)} THEN ${bits + 1 - k}")
      .mkString("\n|      ")
    val scale = (1L << (bits + 1)).toDouble
    val unit = 1L << (bits + 1)
    def dp(c: String) =
      s"coalesce(sum(1::BIGINT << (${bits + 1} - coalesce($c, 0))), 0)" +
        s" + ($m - count(*)) * $unit"
    def est(d: String) =
      s"""round(CAST(${alpha(m)} AS DOUBLE) * CAST(${m.toDouble * m} AS DOUBLE)
         |    * CAST($scale AS DOUBLE) / CAST($d AS DOUBLE), 4) + 0.0""".stripMargin
    // Caller fragments substituted post-stripMargin (see
    // groupedDistinctEstimateSql).
    s"""WITH h AS (
       |  SELECT (__A__) AS a, (__B__) AS b,
       |    ('0x' || substr(md5(CAST(__KEY__ AS VARCHAR)), 1, 8))::BIGINT AS hv
       |  FROM __TABLE__ WHERE (__A__) OR (__B__)),
       |r AS (
       |  SELECT a, b, hv % $m AS idx, hv >> $shift AS v FROM h),
       |rk AS (
       |  SELECT a, b, idx,
       |    CASE
       |      $ladder
       |      ELSE ${bits + 1} END AS rank
       |  FROM r),
       |regs AS (
       |  SELECT idx,
       |    max(CASE WHEN a THEN rank END) AS ma,
       |    max(CASE WHEN b THEN rank END) AS mb,
       |    max(rank) AS mu
       |  FROM rk GROUP BY 1),
       |agg AS (
       |  SELECT ${dp("ma")} AS da, ${dp("mb")} AS db, ${dp("mu")} AS du
       |  FROM regs),
       |e AS (
       |  SELECT ${est("da")} AS est_a, ${est("db")} AS est_b,
       |    ${est("du")} AS est_union
       |  FROM agg)
       |SELECT est_a, est_b, est_union,
       |  round(est_a + est_b - est_union, 4) + 0.0 AS est_overlap
       |FROM e""".stripMargin
      .replace("__TABLE__", table)
      .replace("__A__", aExpr)
      .replace("__B__", bExpr)
      .replace("__KEY__", keyExpr)
  }

  /** The one-row estimate from a register digest (see
    * [[distinctEstimate]] for the math). */
  def estimateFromRegisters(regs: DataFrame, m: Int = 64): DataFrame = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val bits = rankBits(m)
    regs.agg(
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), CAST(${bits + 1} - mj AS INT))"))
          .as("denom_e27"),
        sum(when(col("mj") === 0L, 1L).otherwise(0L)).as("v_zero"))
      .select(
        (round(lit(alpha(m)) * lit(m.toDouble * m) * lit(math.pow(2, bits + 1))
          / col("denom_e27").cast("double"), 4) + lit(0.0)).as("est_hll"),
        col("v_zero"), col("denom_e27"))
  }

  /** DuckDB mirror of [[distinctEstimate]] — same md5 hash, same
    * ladder constants, same integer harmonic sum, same final chain. */
  def distinctEstimateSql(table: String, keyExpr: String, m: Int = 64): String = {
    require(m >= 16 && (m & (m - 1)) == 0, "m must be a power of two >= 16")
    val bits = rankBits(m)
    val shift = Integer.numberOfTrailingZeros(m)
    val ladder = (bits to 1 by -1)
      .map(k => s"WHEN v >= ${1L << (k - 1)} THEN ${bits + 1 - k}")
      .mkString("\n|      ")
    val scale = (1L << (bits + 1)).toDouble
    // sum() outputs are HUGEINT in DuckDB — cast to BIGINT (SURVEY §6).
    // Caller fragments substituted post-stripMargin (see
    // groupedDistinctEstimateSql).
    s"""WITH h AS (
       |  SELECT ('0x' || substr(md5(CAST(__KEY__ AS VARCHAR)), 1, 8))::BIGINT AS hv
       |  FROM __TABLE__),
       |r AS (
       |  SELECT hv % $m AS idx, hv >> $shift AS v FROM h),
       |rk AS (
       |  SELECT idx,
       |    CASE
       |      $ladder
       |      ELSE ${bits + 1} END AS rank
       |  FROM r),
       |regs AS (
       |  SELECT s.idx, coalesce(max(rk.rank), 0) AS mj
       |  FROM (SELECT unnest(generate_series(0, ${m - 1})) AS idx) s
       |  LEFT JOIN rk ON rk.idx = s.idx
       |  GROUP BY 1)
       |SELECT
       |  round(CAST(${alpha(m)} AS DOUBLE) * CAST(${m.toDouble * m} AS DOUBLE)
       |    * CAST($scale AS DOUBLE)
       |    / CAST(sum(1::BIGINT << (${bits + 1} - mj)) AS DOUBLE), 4) + 0.0
       |    AS est_hll,
       |  CAST(sum(CASE WHEN mj = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_zero,
       |  CAST(sum(1::BIGINT << (${bits + 1} - mj)) AS BIGINT) AS denom_e27
       |FROM regs""".stripMargin
      .replace("__TABLE__", table)
      .replace("__KEY__", keyExpr)
  }
}
