package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOf, Cms, Hll, Percentile, SeriesLsh, Skew}

/** Analytics / query-engine surface (SURVEY.md §2.B) with DuckDB oracles.
  *
  * Plan-shape goals at scale: dims broadcast, fact-fact joins shuffle on
  * the join key after filter pushdown, aggregates partial-agg map-side,
  * money math in decimal (exact + order-independent).
  */
object Analytics {

  private def dec182(c: String) = col(c).cast("decimal(18,2)")
  private def dec42(c: String) = col(c).cast("decimal(4,2)")
  private def one = lit(1).cast("decimal(4,2)")
  private def ts(lit0: String) = lit(lit0).cast("timestamp")

  /** l_extendedprice * (1 - l_discount), exact decimal, scale 4. */
  private def discPrice: Column =
    (dec182("l_extendedprice") * (one - dec42("l_discount"))).cast("decimal(18,4)")

  /** Staleness bound for the as-of tolerance query: 1 hour in µs. */
  private val asofToleranceUs = 3600000000L

  // B71 profile column sets (shared by the query and its oracle)
  private val profNumCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val profStrCols = Seq("l_returnflag", "l_linestatus")
  private val profTsCols = Seq("l_shipdate")

  /** DuckDB mirror of `q_table_profile`: one agg CTE, one report row
    * per column. Dialect-type strings match SchemaEvolution.dialectType
    * for the lineitem schema. */
  private def tableProfileSql: String = {
    val dt = Map("l_orderkey" -> "BIGINT", "l_partkey" -> "BIGINT",
      "l_suppkey" -> "BIGINT", "l_linenumber" -> "INTEGER",
      "l_quantity" -> "DOUBLE", "l_extendedprice" -> "DOUBLE",
      "l_discount" -> "DOUBLE", "l_tax" -> "DOUBLE",
      "l_returnflag" -> "VARCHAR", "l_linestatus" -> "VARCHAR",
      "l_shipdate" -> "TIMESTAMP")
    def expr(c: String) =
      if (profTsCols.contains(c)) s"epoch_us($c)" else c
    val aggCols =
      (profNumCols ++ profTsCols).map(c =>
        s"count($c) AS nn_$c, count(DISTINCT $c) AS nd_$c, " +
          s"CAST(min(${expr(c)}) AS DOUBLE) AS mn_$c, " +
          s"CAST(max(${expr(c)}) AS DOUBLE) AS mx_$c") ++
      profStrCols.map(c =>
        s"count($c) AS nn_$c, count(DISTINCT $c) AS nd_$c, " +
          s"min($c) AS ms_$c, max($c) AS xs_$c")
    val numRows = (profNumCols ++ profTsCols).map(c =>
      s"SELECT '$c' AS col_name, '${dt(c)}' AS dtype, n_rows, " +
        s"n_rows - nn_$c AS n_null, nd_$c AS n_distinct, " +
        s"mn_$c AS min_num, mx_$c AS max_num, " +
        "CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str " +
        "FROM a")
    val strRows = profStrCols.map(c =>
      s"SELECT '$c', '${dt(c)}', n_rows, n_rows - nn_$c, nd_$c, " +
        s"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), ms_$c, xs_$c FROM a")
    s"""WITH a AS (
       |  SELECT count(*) AS n_rows,
       |    ${aggCols.mkString(",\n|    ")}
       |  FROM lineitem)
       |${(numRows ++ strRows).mkString("\nUNION ALL\n")}
       |ORDER BY col_name""".stripMargin
  }

  /** Exact interpolated tenth-percentile over a sorted long array `v`
    * with count `n_converted`: pos = (t/10)·(n−1) = k/10 exactly, so
    * the interpolation v[⌊k/10⌋] + (k%10)/10·Δ is the exact integer
    * v[idx+1]·(10−rem) + v[idx+2]·rem over ten, computed as integers
    * with ONE final /10.0 (same IEEE division both engines — immune to
    * the engine-native percentile's ulp divergence at large
    * magnitudes). The idx+2 access is guarded by least(·, n): its
    * coefficient rem is 0 exactly when it would fall off the end. The
    * whole expression is guarded by n > 0 (NULL otherwise, matching
    * DuckDB's NULL-list indexing): with an EMPTY group idx goes
    * negative and element_at would throw, and the negative div/`//`
    * operands diverge between engines. */
  private def pctE1(t: Int): Column = {
    val n = col("n_converted")
    val idx = expr(s"((n_converted - 1) * $t) div 10")
    val rem = ((n - lit(1L)) * lit(t.toLong)) % lit(10L)
    when(n > 0,
      (element_at(col("v"), (idx + 1).cast("int")) * (lit(10L) - rem)
        + element_at(col("v"), least(idx + 2, n).cast("int")) * rem)
        / lit(10.0))
  }

  private val discPriceSql =
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"

  /** Exact fixed-point money sum: quantize per row to a scale-`s` decimal,
    * shift to integer units, sum in DECIMAL(38,0), cast the final aggregate
    * to LONG. Exact and order-independent like a decimal sum, but
    * hash-stable across engines: DecimalType outputs read back from parquet
    * with trailing zeros (`6207673.9400`) while the DuckDB oracle renders
    * `6207673.94`, breaking the driver's string-level hash (proven r2).
    * Int64 columns always hash green — see SURVEY.md §6.
    *
    * Summing in decimal (not long) matters at scale: Spark's non-ANSI
    * sum(long) wraps silently on overflow while DuckDB promotes to
    * HUGEINT — at SF~100 a Q1 `sum_charge_e6` group reaches ~6e18 of
    * Long's 9.2e18 range. Decimal(38,0) gives ~1e38 headroom and only the
    * final (per-group) value must fit in int64, same contract as the
    * oracle's BIGINT cast. The per-row decimal(38,0) cast also rounds
    * half-away-from-zero exactly like DuckDB's CAST, so a caller passing
    * `s` below the input's decimal scale gets identical rounding in both
    * engines instead of Spark truncating where DuckDB rounds.
    */
  private def sumFixed(rowDec: Column, s: Int): Column =
    sum((rowDec * math.pow(10, s).toLong).cast("decimal(38,0)")).cast("long")

  /** DuckDB form of [[sumFixed]]: same per-row decimal quantization, sum
    * in DECIMAL(38,0), final CAST to BIGINT (DuckDB would otherwise render
    * a HUGEINT/DECIMAL sum as a float). */
  private def sumFixedSql(expr: String, s: Int): String =
    s"CAST(sum(CAST(($expr) * ${math.pow(10, s).toLong} AS DECIMAL(38,0))) AS BIGINT)"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // B1: grouped aggregation, decimal-exact (TPC-H Q1 shape)
    "q1_pricing_summary" -> ((s, dir) => {
      val charge = (discPrice * (one + dec42("l_tax"))).cast("decimal(18,6)")
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") < ts("1998-09-01"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumFixed(dec182("l_quantity"), 2).as("sum_qty_e2"),
          sumFixed(dec182("l_extendedprice"), 2).as("sum_base_price_e2"),
          sumFixed(discPrice, 4).as("sum_disc_price_e4"),
          sumFixed(charge, 6).as("sum_charge_e6"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // B2: filter + projection pushdown (TPC-H Q6 shape)
    "q6_revenue_filter" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-01-01")
          && col("l_shipdate") < ts("1997-01-01")
          && col("l_discount") >= 0.03 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .agg(
          sumFixed(dec182("l_extendedprice") * dec42("l_discount"), 4)
            .as("revenue_e4"),
          count(lit(1)).as("n_items"))
    }),

    // B3: 3-way join, broadcast dim, top-N (TPC-H Q3 shape)
    "q3_top_shipping" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") < ts("1998-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val l = Tables.lineitem(s, dir)
        .where(col("l_shipdate") > ts("1998-01-01"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sumFixed(discPrice, 4).as("revenue_e4"))
        .select(col("l_orderkey"), col("revenue_e4"),
          // parquet date column is TIMESTAMP_NTZ; unix_micros is strict
          // about TIMESTAMP, and the session TZ is pinned UTC so the cast
          // is lossless.
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"))
        .orderBy(desc("revenue_e4"), col("o_orderdate_us"), col("l_orderkey"))
        .limit(10)
    }),

    // B4: 6-way star join through region/nation (TPC-H Q5 shape)
    "q5_region_revenue" -> ((s, dir) => {
      val rn = Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).where(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val sup = Tables.supplier(s, dir)
        .join(broadcast(rn), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= ts("1996-01-01")
          && col("o_orderdate") < ts("1997-01-01"))
        .select("o_orderkey", "o_custkey")
      val c = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(sumFixed(discPrice, 4).as("revenue_e4"))
        .orderBy("n_name")
    }),

    // B5: window rank — top-3 orders per customer
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rnk", row_number().over(w).cast("long"))
        .where(col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk")
    }),

    // B6: top-k by aggregate
    "q_topk_customers" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(
          sumFixed(dec182("o_totalprice"), 2).as("total_spend_e2"),
          count(lit(1)).as("n_orders"))
        .orderBy(desc("total_spend_e2"), col("o_custkey"))
        .limit(25)
    }),

    // B7: semi-join (EXISTS)
    "q_semi_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir).where(col("o_orderstatus") === "O")
      Tables.customer(s, dir)
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_nationkey")
    }),

    // B8: anti-join (NOT EXISTS)
    "q_anti_join" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderstatus") === "F" && col("o_totalprice") > 150000)
      Tables.customer(s, dir)
        .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    }),

    // B9: distinct aggregation
    "q_distinct_agg" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          countDistinct(col("o_custkey")).as("n_custs"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // B68: materialized-summary query routing — a (priority, status)
    // rollup of orders is written once, registered as a route, and the
    // user's coarser aggregate over the BASE table is rewritten by the
    // SummaryRoutingRule optimizer rule to re-aggregate the summary
    // partials (sum-of-counts / min-of-mins / max-of-maxes) instead of
    // re-scanning the fact — the in-query assertion FAILS the row if the
    // executed plan still reads orders.parquet, and the oracle
    // aggregates the base table in DuckDB, so parity proves the rewrite
    // answers exactly what the base scan would have. At 100 TB this is
    // the summary-serving read path beside A35's IVM write path.
    "q_summary_route" -> ((s, dir) => {
      import graft.plans.SummaryRouting
      val base = dir + "/orders.parquet"
      // refresh window: with the route live, the summary-building
      // aggregate below is itself a covered shape and would read the
      // artifact it is about to overwrite
      SummaryRouting.deregister(base)
      val sumDir = Cdc.freshScratch(dir, "orders_summary")
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"),
          max(col("o_totalprice")).as("max_tp"),
          min(col("o_totalprice")).as("min_tp"))
        .write.mode("overwrite").parquet(sumDir)
      SummaryRouting.register(s, SummaryRouting.Route(
        baseDir = base, summaryDir = sumDir,
        keys = Map("o_orderpriority" -> "o_orderpriority",
          "o_orderstatus" -> "o_orderstatus"),
        aggs = Map(("count", "*") -> "cnt",
          ("max", "o_totalprice") -> "max_tp",
          ("min", "o_totalprice") -> "min_tp")))
      try {
        val routed = Tables.orders(s, dir)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            max(col("o_totalprice")).as("max_price"),
            min(col("o_totalprice")).as("min_price"))
          .orderBy("o_orderpriority")
        val scans = routed.queryExecution.executedPlan.collectLeaves()
          .map(_.toString).mkString("\n")
        require(scans.contains("orders_summary"),
          "summary route did not fire: aggregate still reads the base scan")
        require(!scans.contains("orders.parquet"),
          "summary route left a base-table scan in the plan")
        // materialize THROUGH the routed plan, then drop the route: a
        // process-global route left live would silently serve any later
        // covered aggregate over the same base path from the scratch
        // artifact (stale-result hazard once the base changes)
        routed.localCheckpoint()
      } finally SummaryRouting.deregister(base)
    }),

    // B70: runtime bloom-filter semi-join reduction, driver-graded —
    // Catalyst builds a bloom filter from the hard-filtered dim side
    // and injects might_contain on the FACT scan, discarding
    // non-joining fact rows BEFORE the shuffle (the engine lever for
    // selective fact⋈dim joins at 100 TB, where the dim no longer
    // broadcasts; keeping join plans declarative is what makes it
    // available). Production size thresholds are scaled down so the
    // injection admits local-test data; the in-plan require (the
    // q_summary_route discipline) FAILS the row if the executed plan
    // lacks the filter, and the result materializes UNDER the bloom
    // plan via localCheckpoint before the confs are restored. Oracle =
    // the plain join aggregate, so driver parity proves the reduction
    // never changes results.
    "q_bloom_join" -> ((s, dir) => {
      val forced = Seq(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
        // bloom reduction targets SHUFFLE joins; at 100 TB this dim
        // wouldn't broadcast, so model that join shape
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")
      val saved = forced.map { case (k, _) =>
        k -> scala.util.Try(s.conf.get(k)).toOption }
      forced.foreach { case (k, v) => s.conf.set(k, v) }
      try {
        val df = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
              .where(col("o_orderpriority") === "1-URGENT"
                && col("o_totalprice") > 200000),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sumFixed(col("l_quantity").cast("decimal(18,2)"), 2)
              .as("sum_qty_e2"))
          .orderBy("o_orderpriority")
        val plan = df.queryExecution.executedPlan.toString
        require(plan.contains("might_contain")
            && plan.contains("bloom_filter_agg"),
          "runtime bloom-filter reduction did not fire on the fact scan")
        df.localCheckpoint()
      } finally saved.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }),

    // B72: approximate query processing on a DETERMINISTIC 1/16
    // sample — the interactive-BI lever at 100 TB: scan ~6% of the
    // fact for a bounded-error answer now, the exact answer later.
    // The sample predicate is the engine-portable md5-bucket rule on
    // the row identity (C20's ladder), NOT rand(): reproducible across
    // runs/engines, scan-local, and a deployment can PERSIST the
    // bucket column and partition by it so the sample scan prunes at
    // the layout level. The query self-grades (the C74 discipline):
    // exact and scaled estimate side by side with an integer
    // relative-error ladder.
    "q_sample_estimate" -> ((s, dir) => {
      import graft.operators.Sampling
      val li = Tables.lineitem(s, dir)
      val rev = col("l_extendedprice").cast("decimal(18,2)")
      val rowId = concat_ws(":", col("l_orderkey"), col("l_linenumber"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(sumFixed(rev, 2).as("exact_e2"),
          count(lit(1)).as("n_rows"))
      val est = li.where(Sampling.bucket(rowId, 16) === 0)
        .groupBy(col("l_returnflag"))
        .agg((sumFixed(rev, 2) * 16).as("est_e2"),
          (count(lit(1)) * 16).as("est_rows"))
      exact.join(est, Seq("l_returnflag"), "left")
        .select(col("l_returnflag"), col("n_rows"), col("exact_e2"),
          coalesce(col("est_rows"), lit(0L)).as("est_rows"),
          coalesce(col("est_e2"), lit(0L)).as("est_e2"))
        .withColumn("abs_err_e4",
          expr("(10000 * abs(est_e2 - exact_e2)) div exact_e2"))
        .orderBy("l_returnflag")
    }),

    // B11: rollup / grouping sets with subtotal rows. NOT a direct
    // rollup over the fact: Expand would triple every fact row before
    // the partial agg (measured 0.7 → 1.6 s at sf0.1 as the sum went
    // decimal; ~3× the scan bytes at any SF). Instead aggregate to the
    // (flag, status) grain first — one ordinary partial-agg shuffle —
    // then rollup the |groups|-row result, where Expand is free.
    // Summing the integer partial sums is exact, so the rewrite can't
    // drift from the single-pass rollup the oracle runs.
    "q_rollup" -> ((s, dir) => {
      val base = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumFixed(dec182("l_quantity"), 2).as("q"),
          count(lit(1)).as("n"))
      base.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("q")).as("sum_qty_e2"), sum(col("n")).as("n_rows"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_qty_e2"), col("n_rows"))
        .orderBy("returnflag", "linestatus")
    }),

    // B11 extension: grouping_id() disambiguates a subtotal row from a
    // genuinely-'ALL'-labelled key value — without it a reader of the
    // rollup output cannot tell data from aggregate. Bit order (first
    // rollup column = MSB) is identical in Spark's grouping_id() and
    // DuckDB's GROUPING(); same pre-aggregate-then-Expand shape.
    "q_rollup_gid" -> ((s, dir) => {
      val base = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumFixed(dec182("l_quantity"), 2).as("q"),
          count(lit(1)).as("n"))
      base.rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("q")).as("sum_qty_e2"), sum(col("n")).as("n_rows"),
          grouping_id().cast("long").as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("gid"), col("sum_qty_e2"), col("n_rows"))
        .orderBy("gid", "returnflag", "linestatus")
    }),

    // B11 extension: full CUBE (all four grouping sets) with the same
    // pre-aggregate-then-expand shape as q_rollup — Expand runs on the
    // |groups|-row aggregate, never the fact scan.
    "q_cube" -> ((s, dir) => {
      val base = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumFixed(dec182("l_extendedprice"), 2).as("p"),
          count(lit(1)).as("n"))
      base.cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("p")).as("sum_price_e2"), sum(col("n")).as("n_rows"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("sum_price_e2"), col("n_rows"))
        .orderBy("returnflag", "linestatus")
    }),

    // B11 extension (B57): explicit GROUPING SETS — the ((flag,status),
    // (shipyear), ()) combination is neither a rollup nor a cube, so it
    // exercises the arbitrary-set Expand path directly. Same
    // pre-aggregate-then-expand shape: the fact shuffles once to the
    // (flag, status, shipyear) grain, Expand runs on |groups| rows.
    // grouping_id() bit order (first listed column = MSB) matches
    // DuckDB's GROUPING(); integer partial sums keep the rewrite exact.
    "q_grouping_sets" -> ((s, dir) => {
      val base = Tables.lineitem(s, dir)
        .withColumn("shipyear", year(col("l_shipdate")).cast("long"))
        .groupBy(col("l_returnflag"), col("l_linestatus"), col("shipyear"))
        .agg(
          sumFixed(dec182("l_quantity"), 2).as("q"),
          count(lit(1)).as("n"))
      base.groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("shipyear")), Seq.empty),
          col("l_returnflag"), col("l_linestatus"), col("shipyear"))
        .agg(sum(col("q")).as("sum_qty_e2"), sum(col("n")).as("n_rows"),
          grouping_id().cast("long").as("gid"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          coalesce(col("shipyear"), lit(-1L)).as("shipyear"),
          col("gid"), col("sum_qty_e2"), col("n_rows"))
        .orderBy("gid", "returnflag", "linestatus", "shipyear")
    }),

    // B12: part-profit star join (TPC-H Q9 shape) — part/supplier joins
    // left unhinted so AQE picks broadcast when a side is small at
    // runtime; at 100 TB both sides scale and shuffle-join on the key.
    "q9_part_profit" -> ((s, dir) => {
      val p = Tables.part(s, dir).where(col("p_size") <= 20)
        .select("p_partkey", "p_brand")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), col("p_brand"))
        .agg(sumFixed(discPrice, 4).as("profit_e4"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name", "p_brand")
    }),

    // B21: EXISTS semi-join per priority class (TPC-H Q4 shape, adapted:
    // no l_commitdate in the reduced schema → "any lineitem shipped
    // after the order date")
    "q4_priority_exists" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= ts("1996-01-01")
          && col("o_orderdate") < ts("1996-07-01"))
      val l = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(l, col("o_orderkey") === col("l_orderkey")
          && col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // B22: bidirectional nation-pair trade volume by year (TPC-H Q7
    // shape) — both nation dims broadcast; the fact-fact joins shuffle
    "q7_volume_shipping" -> ((s, dir) => {
      val pair = Set("NATION_3", "NATION_7")
      val n1 = Tables.nation(s, dir)
        .where(col("n_name").isin(pair.toSeq: _*))
        .select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, dir)
        .where(col("n_name").isin(pair.toSeq: _*))
        .select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-01-01")
          && col("l_shipdate") < ts("1998-01-01"))
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
          "l_shipdate")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir).select("c_custkey", "c_nationkey"),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sk"))
        .join(broadcast(n2), col("c_nationkey") === col("ck"))
        .where(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(sumFixed(discPrice, 4).as("revenue_e4"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    }),

    // B23: returned-item revenue ranking, top 20 customers (TPC-H Q10
    // shape); acctbal emitted as cents-scaled BIGINT (SURVEY §6)
    "q10_returned_top" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= ts("1996-01-01")
          && col("o_orderdate") < ts("1996-04-01"))
        .select("o_orderkey", "o_custkey")
      val l = Tables.lineitem(s, dir)
        .where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val n = Tables.nation(s, dir).select("n_nationkey", "n_name")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(sumFixed(discPrice, 4).as("revenue_e4"),
          max((dec182("c_acctbal") * 100).cast("long")).as("acctbal_e2"))
        .orderBy(desc("revenue_e4"), col("c_custkey"))
        .limit(20)
    }),

    // B24: promo revenue share (TPC-H Q14 shape) — conditional aggregate;
    // the share divides two exact BIGINTs so the double is identical in
    // both engines
    "q14_promo_share" -> ((s, dir) => {
      val promo = when(col("p_type") === "PROMO", discPrice)
        .otherwise(lit(0).cast("decimal(18,4)"))
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-09-01")
          && col("l_shipdate") < ts("1996-10-01"))
        .select("l_partkey", "l_extendedprice", "l_discount")
        .join(Tables.part(s, dir).select("p_partkey", "p_type"),
          col("l_partkey") === col("p_partkey"))
        .agg(sumFixed(promo, 4).as("promo_revenue_e4"),
          sumFixed(discPrice, 4).as("total_revenue_e4"))
        .select(col("promo_revenue_e4"), col("total_revenue_e4"),
          round(lit(100.0) * col("promo_revenue_e4") / col("total_revenue_e4"), 4)
            .as("promo_share"))
    }),

    // B25: small-quantity outlier revenue (TPC-H Q17 shape) — correlated
    // scalar subquery as a per-part aggregate join; the per-part average
    // is computed EXACTLY (integer cent sum / count) so the 20% threshold
    // is engine-deterministic, never a parallel float sum. The average's
    // input is pre-filtered by the broadcast part join (only Brand#23
    // parts can reach the final join), so the aggregate shuffles ~1/25
    // of lineitem instead of every part's rows.
    "q17_small_qty" -> ((s, dir) => {
      val pk = Tables.part(s, dir)
        .where(col("p_brand") === "Brand#23").select("p_partkey")
      val lf = Tables.lineitem(s, dir)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
        .drop("p_partkey")
      val avgq = lf.groupBy(col("l_partkey").as("ap"))
        .agg((sum((dec182("l_quantity") * 100).cast("decimal(38,0)")).cast("double")
          / (lit(100.0) * count(lit(1)))).as("avg_qty"))
      lf.join(avgq, col("l_partkey") === col("ap"))
        .where(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(sumFixed(dec182("l_extendedprice"), 2).as("sum_price_e2"),
          count(lit(1)).as("n_items"))
    }),

    // B26: large-volume orders (TPC-H Q18 shape) — HAVING on a grouped
    // fact, then join back to order/customer detail
    "q18_large_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sumFixed(dec182("l_quantity"), 2).as("sum_qty_e2"))
        .where(col("sum_qty_e2") > 250 * 100)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir).select("c_custkey", "c_name"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_orderdate_us"),
          (dec182("o_totalprice") * 100).cast("long").as("o_totalprice_e2"),
          col("sum_qty_e2"))
        .orderBy(desc("o_totalprice_e2"), col("o_orderkey"))
        .limit(20)
    }),

    // B27: disjunctive multi-range predicate (TPC-H Q19 shape) — the OR
    // groups stay a single scan filter + one join, testing that neither
    // engine falls back to a union of scans
    "q19_disjunctive" -> ((s, dir) => {
      val p = Tables.part(s, dir).select("p_partkey", "p_brand", "p_size")
      Tables.lineitem(s, dir)
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(p, col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
            && col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
            && col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
            && col("l_quantity").between(20, 30)))
        .agg(sumFixed(discPrice, 4).as("revenue_e4"),
          count(lit(1)).as("n_items"))
    }),

    // B28: churned high-value customers per nation (TPC-H Q22 shape,
    // adapted: every customer has orders, so "idle" = none after
    // 2000-01-01) — global exact-average scalar via broadcast 1-row agg,
    // anti-join on recent orders
    "q22_churned_customers" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val avgBal = c.where(col("c_acctbal") > 0)
        .agg((sum((dec182("c_acctbal") * 100).cast("decimal(38,0)")).cast("double")
          / (lit(100.0) * count(lit(1)))).as("avg_bal"))
      val recent = Tables.orders(s, dir)
        .where(col("o_orderdate") >= ts("2000-01-01"))
        .select("o_custkey")
      c.crossJoin(broadcast(avgBal))
        .where(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, dir)
          .select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_custs"),
          sum((dec182("c_acctbal") * 100).cast("decimal(38,0)")).cast("long")
            .as("sum_acctbal_e2"))
        .orderBy("n_name")
    }),

    // B29: national market share by year (TPC-H Q8 shape) — 7-table star:
    // tiny dims (region, nation×2) broadcast, part filter cuts the fact
    // before the orders join, customer/supplier left to AQE. The share is
    // a conditional-agg ratio like Q14, so one pass computes both sums.
    "q8_market_share" -> ((s, dir) => {
      val p = Tables.part(s, dir).where(col("p_type") === "STANDARD")
        .select("p_partkey")
      val o = Tables.orders(s, dir)
        .where(col("o_orderdate") >= ts("1995-01-01")
          && col("o_orderdate") < ts("1997-01-01"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val cust = Tables.customer(s, dir).select("c_custkey", "c_nationkey")
      val n1 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("cnk"), col("n_regionkey"))
      val reg = Tables.region(s, dir).where(col("r_name") === "ASIA")
        .select("r_regionkey")
      val sup = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      val n2 = Tables.nation(s, dir)
        .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
      val natVol = when(col("supp_nation") === "NATION_3", discPrice)
        .otherwise(lit(0).cast("decimal(18,4)"))
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("cnk"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("snk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sumFixed(natVol, 4).as("nation_volume_e4"),
          sumFixed(discPrice, 4).as("total_volume_e4"))
        .select(col("o_year"), col("nation_volume_e4"),
          col("total_volume_e4"),
          round(lit(100.0) * col("nation_volume_e4")
            / col("total_volume_e4"), 4).as("mkt_share"))
        .orderBy("o_year")
    }),

    // B30: customer order-count distribution (TPC-H Q13 shape) — LEFT
    // join so zero-order customers land in the c_count=0 bucket; two
    // partial-agg shuffles (custkey then count), no window.
    "q13_cust_distribution" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .where(col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_custkey")
      Tables.customer(s, dir).select("c_custkey")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // B31: top supplier by quarterly revenue (TPC-H Q15 shape) — the
    // revenue view is one partial-agg shuffle; the max is a 1-row
    // broadcast scalar (never a global sort), ties all returned.
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1996-01-01")
          && col("l_shipdate") < ts("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sumFixed(discPrice, 4).as("total_revenue_e4"))
      val maxRev = rev.agg(max(col("total_revenue_e4")).as("max_rev"))
      rev.crossJoin(broadcast(maxRev))
        .where(col("total_revenue_e4") === col("max_rev"))
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue_e4"))
        .orderBy("s_suppkey")
    }),

    // B51: min-cost supplier (TPC-H Q2 shape, adapted: the reduced schema
    // has no partsupp, so the part×supplier offer grain — TPC-H's
    // ps_supplycost — is derived once from lineitem history as the min
    // unit price each supplier ever charged for the part). The correlated
    // "= (SELECT min(...))" subquery is expressed Spark-first as a
    // per-part min over the SAME pre-aggregated offer grain: the offer
    // aggregate partitions by (part, supplier), the min re-shuffles only
    // the |parts×suppliers-in-region| grain (never the fact), and the
    // region-filtered supplier dim broadcasts into both. Unit cost stays
    // in integer µ-units (scaled-long div) so the min and the equality
    // rejoin are exact in both engines — a double division would make
    // "cost = min(cost)" float-equality across engines.
    "q2_min_cost_supp" -> ((s, dir) => {
      val unitCost = expr(
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 10000 AS BIGINT)" +
          " div CAST(l_quantity AS BIGINT)")
      val euroSupp = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)
          .where(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
      val offers = Tables.lineitem(s, dir)
        .select(col("l_partkey"), col("l_suppkey"),
          unitCost.as("unit_cost_e4"))
        .join(broadcast(euroSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(min(col("unit_cost_e4")).as("cost_e4"),
          first(col("s_name")).as("s_name"),
          first(col("s_acctbal")).as("s_acctbal"),
          first(col("n_name")).as("n_name"))
      val minCost = offers.groupBy(col("l_partkey").as("mc_partkey"))
        .agg(min(col("cost_e4")).as("min_cost_e4"))
      offers
        .join(minCost, col("l_partkey") === col("mc_partkey")
          && col("cost_e4") === col("min_cost_e4"))
        .join(Tables.part(s, dir)
          .where(col("p_type") === "STANDARD" && col("p_size") <= 10)
          .select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .select((dec182("s_acctbal") * 100).cast("long").as("s_acctbal_e2"),
          col("s_name"), col("n_name"), col("p_partkey"), col("p_brand"),
          col("cost_e4"))
        .orderBy(desc("s_acctbal_e2"), col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // B52: important stock (TPC-H Q11 shape, adapted: part value held by
    // one nation's suppliers = lineitem revenue in place of availqty ×
    // supplycost) — grouped sum HAVING > fraction of the GLOBAL sum. The
    // global scalar is a broadcast 1-row aggregate over the already-
    // grouped per-part frame (q22's pattern), so the fact is scanned
    // once; the fraction compare runs in exact scaled-long space
    // (value_e2 × 1000 > total_e2), never a float ratio.
    "q11_important_stock" -> ((s, dir) => {
      val natSupp = Tables.supplier(s, dir)
        .join(broadcast(Tables.nation(s, dir)
          .where(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val vals = Tables.lineitem(s, dir)
        .select("l_partkey", "l_suppkey", "l_extendedprice")
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sumFixed(dec182("l_extendedprice"), 2).as("value_e2"))
      val total = vals
        .agg(sum(col("value_e2").cast("decimal(38,0)")).cast("long")
          .as("total_e2"))
      vals.crossJoin(broadcast(total))
        .where(col("value_e2") * 1000 > col("total_e2"))
        .select(col("l_partkey"), col("value_e2"))
        .orderBy(desc("value_e2"), col("l_partkey"))
    }),

    // B53: late-shipment priority split (TPC-H Q12 shape, adapted: no
    // l_shipmode/l_receiptdate — "late" = shipped >90 days after the
    // order date, grouped by return flag) — the two-way conditional
    // aggregate: one fact-orders equi-join, CASE-sums partial-agg
    // map-side, no Expand and no second scan for the second count.
    "q12_ship_priority" -> ((s, dir) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_shipdate", "l_returnflag")
        .where(col("l_shipdate") >= ts("1996-01-01")
          && col("l_shipdate") < ts("1997-01-01"))
        .join(Tables.orders(s, dir)
          .select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag")
    }),

    // B54: supplier-count by part attribute (TPC-H Q16 shape, adapted:
    // the part×supplier relation comes from lineitem; "complaint"
    // suppliers = negative account balance) — count(DISTINCT supplier)
    // per (brand, size) with an excluded-supplier anti-join. The
    // exclusion list is a broadcast anti-join on the fact BEFORE the
    // grouped distinct (the NOT IN of the oracle), so excluded rows
    // never enter the distinct's Expand; the distinct aggregate
    // partial-aggregates the (brand, size, suppkey) grain map-side.
    "q16_supplier_cnt" -> ((s, dir) => {
      val badSupp = Tables.supplier(s, dir)
        .where(col("s_acctbal") < 0).select("s_suppkey")
      Tables.lineitem(s, dir).select("l_partkey", "l_suppkey")
        .join(broadcast(badSupp),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(Tables.part(s, dir)
          .where(col("p_brand") =!= "Brand#45" && col("p_type") =!= "PROMO"
            && col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22))
          .select("p_partkey", "p_brand", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_size"))
    }),

    // B55: dominant-share suppliers (TPC-H Q20 shape, adapted: availqty
    // has no source table, so "excess supply" = the supplier shipped
    // more than HALF of a part's 1995 volume) — the nested semi-join
    // chain: part filter → per-(part, supplier) volume → correlated
    // per-part threshold → DISTINCT suppliers ⋉ supplier dim. The
    // correlated "0.5 × sum(l_quantity)" subquery is a window sum over
    // the SAME (part, supplier) aggregate grain — zero extra shuffles
    // (the window reuses the groupBy partitioning); the share compare
    // is exact in scaled longs (2×supp > total).
    "q20_excess_supply" -> ((s, dir) => {
      val qty = Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= ts("1995-01-01")
          && col("l_shipdate") < ts("1996-01-01"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(broadcast(Tables.part(s, dir)
          .where(col("p_name").like("%gear%")).select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sumFixed(dec182("l_quantity"), 2).as("qty_e2"))
      val w = Window.partitionBy(col("l_partkey"))
      val dom = qty
        .withColumn("tot_e2", sum(col("qty_e2")).over(w))
        .where(col("qty_e2") * 2 > col("tot_e2"))
        .select(col("l_suppkey")).distinct()
      Tables.supplier(s, dir)
        .join(dom, col("s_suppkey") === col("l_suppkey"))
        .join(broadcast(Tables.nation(s, dir)
          .select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_name"), col("n_name"),
          (dec182("s_acctbal") * 100).cast("long").as("s_acctbal_e2"))
        .orderBy("s_name")
    }),

    // B41: suppliers who kept orders waiting (TPC-H Q21 shape, adapted:
    // no l_receiptdate/l_commitdate in the reduced schema → "late" =
    // shipped >365 days after the order date). The classic doubly-
    // correlated EXISTS/NOT-EXISTS is rewritten Spark-first as one
    // per-(order, supplier) partial agg + one per-order agg — two
    // key-local shuffles on the already-joined fact, no Expand (the
    // distinct-supplier counts come from the pre-aggregated grain, not
    // count_distinct), no per-row subqueries. A supplier "waits" an
    // order when it is the ONLY late supplier on a multi-supplier order.
    "q21_waiting_suppliers" -> ((s, dir) => {
      val late = col("l_shipdate") >
        col("o_orderdate") + expr("INTERVAL 365 DAYS")
      val lo = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(late).as("supp_late"))
      // per-order supplier counts as an unordered window over the
      // pre-aggregated (order, supplier) grain — one extra exchange on
      // l_orderkey, no self-join (which would re-evaluate the whole
      // aggregate subplan on both sides)
      val w = Window.partitionBy(col("l_orderkey"))
      lo
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_late_supp",
          sum(when(col("supp_late"), 1L).otherwise(0L)).over(w))
        .where(col("supp_late") && col("n_supp") > 1
          && col("n_late_supp") === 1)
        .join(Tables.supplier(s, dir).select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(10)
    }),

    // B42: null-aware NOT IN anti-join — `NOT IN (subquery)` over a
    // NULLABLE key is NOT a plain anti-join (one NULL in the list empties
    // the result), so Spark plans a null-aware BroadcastHashJoin
    // (broadcast-only by design: the null check needs the whole build
    // side). Expressed in SQL because only the optimizer's NOT IN rewrite
    // produces that plan, and the list column is wrapped in a CASE so its
    // TYPE is nullable (the parquet field is required, which would let
    // Spark simplify back to the plain anti-join) while the WHERE
    // guarantees no actual NULL — the SQL-standard three-valued semantics
    // stay observable without degenerating to an empty result. The
    // subquery pre-aggregates to DISTINCT big-spender keys, bounding the
    // broadcast by |matching customers|, not |orders|.
    "q_not_in" -> ((s, dir) => {
      s.sql(
        s"""SELECT c_custkey, c_name, c_mktsegment
           |FROM parquet.`$dir/customer.parquet`
           |WHERE c_custkey NOT IN (
           |  SELECT DISTINCT CASE WHEN o_totalprice > 400000 THEN o_custkey END
           |  FROM parquet.`$dir/orders.parquet`
           |  WHERE o_totalprice > 400000)
           |ORDER BY c_custkey""".stripMargin)
    }),

    // B34: date-spine gap-fill + 7-day moving window — daily revenue per
    // market segment with missing days zero-filled against a generated
    // date spine, then an exact 7-day rolling cent-sum. The spine is
    // |segments| × |days| (tiny: it comes from a broadcast 1-row
    // min/max agg exploded into dates, cross-joined with the 5-row
    // segment list), so the only corpus-sized work is the daily
    // partial-agg shuffle; the rolling window partitions by segment.
    "q_gapfill" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"),
          to_date(col("o_orderdate")).as("day"))
        .agg(sumFixed(dec182("o_totalprice"), 2).as("rev_c"))
      val days = Tables.orders(s, dir)
        .agg(min(to_date(col("o_orderdate"))).as("d0"),
          max(to_date(col("o_orderdate"))).as("d1"))
        .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val segments = Tables.customer(s, dir)
        .select(col("c_mktsegment").as("segment")).distinct()
      val spine = segments.crossJoin(broadcast(days))
      val w = Window.partitionBy(col("segment")).orderBy(col("day"))
        .rowsBetween(-6, Window.currentRow)
      spine.join(daily, Seq("segment", "day"), "left")
        .withColumn("revenue_cents", coalesce(col("rev_c"), lit(0L)))
        .select(col("segment"), date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("revenue_cents"),
          sum(col("revenue_cents")).over(w).as("revenue_7d_cents"))
        .orderBy("segment", "day")
    }),

    // B35: year-over-year monthly revenue — the lag(12) comparison done
    // as an equi-self-join on the month index over the CHECKPOINTED
    // ~80-row monthly aggregate (a lag window over the global month
    // order would be one unpartitioned sort; the tiny-side self-join
    // shape costs one broadcast instead, and the corpus is scanned
    // exactly once thanks to the checkpoint).
    "q_yoy" -> ((s, dir) => {
      val monthly = Tables.orders(s, dir)
        .groupBy(year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(sumFixed(dec182("o_totalprice"), 2).as("revenue_cents"))
        .withColumn("__m", col("yr") * 12 + col("mo"))
        .localCheckpoint()
      val prev = monthly.select((col("__m") + 12).as("__m"),
        col("revenue_cents").as("prev_year_cents"))
      monthly.join(broadcast(prev), Seq("__m"), "left")
        .select(col("yr"), col("mo"), col("revenue_cents"),
          col("prev_year_cents"),
          // + 0.0: a tiny negative YoY delta rounds to -0.0 in DuckDB,
          // 0.0 in Spark (SURVEY §6 negative-zero rule).
          (round((col("revenue_cents") - col("prev_year_cents"))
            * 100.0 / col("prev_year_cents"), 4) + lit(0.0)).as("yoy_pct"))
        .orderBy("yr", "mo")
    }),

    // B36: salted skew join — orders⨝customer on the salted (key, salt)
    // pair; result provably identical to the plain join (the oracle IS
    // the plain join), while a viral custkey's rows spread over `salts`
    // reducers instead of one. The manual fallback when AQE skew-split
    // can't apply.
    "q_salted_join" -> ((s, dir) => {
      Skew.saltedJoin(
          Tables.orders(s, dir).select(
            col("o_custkey").as("c_custkey"), col("o_totalprice")),
          Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
          key = "c_custkey", salts = 8)
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n_orders"),
          sumFixed(dec182("o_totalprice"), 2).as("revenue_cents"))
        .orderBy("segment")
    }),

    // B49: join-key skew profile — the diagnostics pass BEFORE
    // choosing a salted join: top-10 heaviest lineitem part keys with
    // the global distribution (skew_factor = max/mean per-key weight).
    // One key-agg shuffle + a K-row heap per partition; stats broadcast.
    "q_skew_report" -> ((s, dir) => {
      Skew.keyProfile(Tables.lineitem(s, dir), "l_partkey", topK = 10)
    }),

    // B32: event funnel view→click→purchase — each stage is "first
    // qualifying event strictly after the previous stage's first", so
    // every step is an equi-join on user_id + one partial-agg shuffle;
    // stage counts union into rows (no scalar cross-joins).
    // B73: multi-touch conversion attribution — every purchase credits
    // the view/click touchpoints of the SAME user in its trailing
    // 7 days, under two standard models: LINEAR (10000/n e4 credit per
    // touch, floor div — deterministic) and POSITIONAL (U-shaped
    // 40/20/40: first and last touch 4000 each, middles split 2000;
    // n=1 → 10000, n=2 → 5000/5000). The join is a per-user equi-join
    // with a range predicate — at scale it hash-partitions on user_id
    // and the 7-day bound keeps per-pair work windowed (the B15
    // range-join family); per-purchase ranks are ONE window over the
    // purchase id. Exact integer e4 ladders end to end — no float
    // credit fractions to diverge cross-engine.
    "q_attribution" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.events(s, dir)
        .select("user_id", "event_type", "ts_us", "event_id")
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("p_ts"),
          col("event_id").as("p_id"))
      val touches = ev.where(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("ts_us").as("t_ts"),
          col("event_type").as("touch_type"), col("event_id").as("t_id"))
      val horizonUs = 7L * 86400000000L
      val joined = purchases.join(touches,
        purchases("user_id") === touches("user_id") &&
          col("t_ts") <= col("p_ts") &&
          col("t_ts") > col("p_ts") - horizonUs)
      val wAll = Window.partitionBy(col("p_id"))
      val wOrd = Window.partitionBy(col("p_id"))
        .orderBy(col("t_ts"), col("t_id"))
      val ranked = joined
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("r", row_number().over(wOrd))
      val credited = ranked
        .withColumn("linear_e4", expr("10000 div n"))
        .withColumn("pos_e4",
          when(col("n") === 1, 10000L)
            .when(col("n") === 2, 5000L)
            .when(col("r") === 1 || col("r") === col("n"), 4000L)
            .otherwise(expr("2000 div (n - 2)")))
      credited.groupBy(col("touch_type"))
        .agg(count(lit(1)).as("n_touches"),
          sum(col("linear_e4")).as("linear_credit_e4"),
          sum(col("pos_e4")).as("positional_credit_e4"))
        .orderBy("touch_type")
    }),

    "q_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("user_id", "event_type", "ts_us")
      val firstView = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("view_ts"))
      val firstClick = ev.where(col("event_type") === "click")
        .join(firstView, "user_id")
        .where(col("ts_us") > col("view_ts"))
        .groupBy("user_id").agg(min(col("ts_us")).as("click_ts"))
      val firstPurchase = ev.where(col("event_type") === "purchase")
        .join(firstClick, "user_id")
        .where(col("ts_us") > col("click_ts"))
        .groupBy("user_id").agg(min(col("ts_us")).as("purchase_ts"))
      firstView.agg(count(lit(1)).as("n_users"))
        .select(lit("1_view").as("stage"), col("n_users"))
        .unionAll(firstClick.agg(count(lit(1)).as("n_users"))
          .select(lit("2_click").as("stage"), col("n_users")))
        .unionAll(firstPurchase.agg(count(lit(1)).as("n_users"))
          .select(lit("3_purchase").as("stage"), col("n_users")))
        .orderBy("stage")
    }),

    // B67: grouped mode with deterministic tiebreak — the single most
    // active user per event type via max_by over the pre-aggregated
    // (type, user) grain (argmax = max_by(user, (n, -user)): highest
    // count wins, ties to the LOWEST user id — B31 keeps ties, this
    // picks one winner deterministically). Two map-side-combined
    // shuffles, the second over |types|·|users| grain rows only.
    "q_mode_user" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("event_type"))
        .agg(
          max_by(col("user_id"), struct(col("n"), -col("user_id")))
            .as("top_user"),
          max(struct(col("n"), -col("user_id"))).getField("n")
            .as("top_n"))
        .orderBy("event_type")
    }),

    // B66: inter-event burstiness — per user, the coefficient of
    // variation of inter-arrival gaps (CV ≈ 1 Poisson, ≫1 bursty,
    // ≪1 metronomic — the traffic-shape profile behind capacity
    // planning and bot screens), then a corpus-level CV histogram.
    // Gaps from one user-window lag; mean/variance from exact integer
    // sum/sumsq (the B59 recipe — no float summation order); users
    // need ≥3 gaps. Output is the bounded |buckets| histogram.
    "q_burstiness" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val gaps = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"))
        .withColumn("prev", lag(col("ts_us"), 1).over(w))
        .where(col("prev").isNotNull)
        // gaps in SECONDS (exact integer div): µs-squared sums overflow
        // int64; second granularity keeps sumsq ≪ 2^63 at any scale
        .select(col("user_id"),
          expr("(ts_us - prev) div 1000000").as("gap"))
      val per = gaps.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("gap")).as("sm"),
          sum(col("gap") * col("gap")).as("sq"))
        .where(col("n") >= 3)
      val mean = col("sm").cast("double") / col("n")
      val variance =
        (col("sq").cast("double")
          - col("sm").cast("double") * col("sm") / col("n")) / (col("n") - 1)
      per.select(col("user_id"),
          when(mean > 0, sqrt(variance) / mean).otherwise(lit(0.0)).as("cv"))
        .groupBy(floor(col("cv") * 2).cast("long").as("cv_bucket"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cv_bucket")
    }),

    // B65: funnel conversion-latency percentiles — B32's funnel with
    // the time-to-convert distribution (view→purchase µs) for the
    // users who completed it: same per-stage min-ts equi-joins, then
    // exact percentiles over the |converted-users| latency frame (the
    // bounded-cardinality grain where exact percentile is safe — the
    // B13/B45 tradeoff documented there applies at the event grain).
    "q_funnel_latency" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("user_id", "event_type", "ts_us")
      val firstView = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts_us")).as("view_ts"))
      val firstClick = ev.where(col("event_type") === "click")
        .join(firstView, "user_id")
        .where(col("ts_us") > col("view_ts"))
        .groupBy("user_id").agg(min(col("ts_us")).as("click_ts"),
          first(col("view_ts")).as("view_ts"))
      val firstPurchase = ev.where(col("event_type") === "purchase")
        .join(firstClick, "user_id")
        .where(col("ts_us") > col("click_ts"))
        .groupBy("user_id").agg(min(col("ts_us")).as("purchase_ts"),
          first(col("view_ts")).as("view_ts"))
      // Exact interpolated percentiles in INTEGER arithmetic: lat_us
      // are longs and p ∈ {5,9}/10, so pos = p·(n−1) is the exact
      // rational k/10 — p_e1 = v[k/10]·(10−k%10) + v[k/10+1]·(k%10)
      // is an exact integer and the single /10.0 is the same IEEE op
      // in both engines. (Engine-native percentile interpolation
      // differs by 1 ulp at ~8e11 µs magnitudes where 1 ulp ≈ 1.2e-4 —
      // bigger than the round(4) guard; caught by the sf0.001 gate,
      // r10.) Same bounded state as the engine's exact percentile:
      // both buffer the group's values once.
      firstPurchase
        .select((col("purchase_ts") - col("view_ts")).as("lat_us"))
        .agg(count(lit(1)).as("n_converted"),
          sort_array(collect_list(col("lat_us"))).as("v"),
          max(col("lat_us")).as("max_us"))
        .select(col("n_converted"),
          pctE1(5).as("p50_us"), pctE1(9).as("p90_us"), col("max_us"))
    }),

    // B33: day-N retention cohorts — activity reduced to distinct
    // (user, day) BEFORE any join, cohort = min day per user, offsets
    // pre-distincted so the final agg is plain sums (no count-distinct
    // Expand); every shuffle is on user_id or the tiny cohort_day.
    "q_retention" -> ((s, dir) => {
      val dayUs = 86400000000L
      val activity = Tables.events(s, dir)
        .select(col("user_id"), expr(s"ts_us div $dayUs").as("day"))
        .distinct()
      val cohort = activity.groupBy("user_id")
        .agg(min(col("day")).as("cohort_day"))
      activity.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_day"),
          (col("day") - col("cohort_day")).as("off"))
        .groupBy(col("cohort_day"))
        .agg(
          sum(when(col("off") === 0, 1L).otherwise(0L)).as("n_day0"),
          sum(when(col("off") === 1, 1L).otherwise(0L)).as("n_day1"),
          sum(when(col("off") === 7, 1L).otherwise(0L)).as("n_day7"))
        .orderBy("cohort_day")
    }),

    // B59: event-rate anomaly screen — per (event_type, day) volume
    // z-scored against the trailing 7 OBSERVED days (rows frame, so a
    // gap day shrinks the baseline instead of silently zero-filling).
    // Mean/variance come from exact integer sum/sumsq over the frame —
    // the double expression is evaluated from identical exact longs in
    // both engines, so no float summation order can diverge; z needs
    // ≥3 baseline days and positive variance, else NULL. ONE partial-agg
    // shuffle to the (type, day) grain + one type-partitioned window
    // (|types| × |days| rows — spine-sized, never event-sized).
    "q_rate_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val dayUs = 86400000000L
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), expr(s"ts_us div $dayUs").as("day"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-7, -1)
      val cnt = count(col("n")).over(w)
      val sm = sum(col("n")).over(w)
      val sq = sum(col("n") * col("n")).over(w)
      val mean = sm.cast("double") / cnt
      val varTrail =
        (sq.cast("double") - sm.cast("double") * sm / cnt) / (cnt - lit(1))
      val z = when(cnt >= 3 && varTrail > 0,
        (col("n") - mean) / sqrt(varTrail))
      daily.select(col("event_type"), col("day"), col("n"),
          cnt.as("base_days"), round(mean, 4).as("mean7"),
          round(z, 4).as("z"),
          when(abs(z) > 2, 1L).otherwise(0L).as("anomaly"))
        .orderBy("event_type", "day")
    }),

    // B63: UNPIVOT (B17's inverse) — the wide per-flag measure columns
    // melt to (flag, measure, value_e2) rows via stack(), the Expand
    // path in the plan; the melt runs on the already-aggregated
    // |flags|-row frame (pre-aggregate-then-expand, the B11 rule), so
    // Expand multiplies 3 rows, not the fact scan. Values exact cents.
    "q_unpivot" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          sumFixed(dec182("l_extendedprice"), 2).as("price_e2"),
          sumFixed(dec42("l_discount"), 2).as("discount_e2"),
          sumFixed(dec42("l_tax"), 2).as("tax_e2"))
        .select(col("l_returnflag"), expr(
          "stack(3, 'extendedprice', price_e2, 'discount', discount_e2, " +
            "'tax', tax_e2) AS (measure, value_e2)"))
        .orderBy("l_returnflag", "measure")
    }),

    // B64: bounded-state grouped top-k via a native
    // TypedImperativeAggregate (graft_topk) — the aggregate formulation
    // of per-group top-k: a size-k min-heap per group with MAP-SIDE
    // partial aggregation, so shuffled bytes ~ |groups|·k where the
    // window-rank form (row_number over partition order by desc ≤ k)
    // shuffles and sorts every row. Output the sorted-desc values as
    // csv (the house array convention); oracle = DuckDB's max(x, k).
    "q_topk_agg" -> ((s, dir) => {
      import graft.functions.BoundedTopK
      import org.apache.spark.sql.GraftSqlBridge
      val cents = (col("value").cast("decimal(18,2)") * 100).cast("long")
      val topk = GraftSqlBridge.column(
        BoundedTopK(GraftSqlBridge.expression(col("cents")), 5)
          .toAggregateExpression())
      Tables.events(s, dir)
        .withColumn("cents", cents)
        .groupBy(col("event_type"))
        .agg(concat_ws(",", topk.cast("array<string>")).as("top5_e2"))
        .orderBy("event_type")
    }),

    // B62: exponentially-decayed (EWMA) activity score — per event
    // type, trailing-30-day daily volumes weighted by 0.9^age (the
    // freshness-weighted health metric dashboards poll; the decayed
    // cousin of B59's flat window). Per-day terms snap to the round(9)
    // e9 DECIMAL ladder BEFORE the sum (the C70 recipe), so the
    // decayed total is an exact integer cross-engine despite the pow.
    // Scale: one partial-agg shuffle to the (type, day) grain; all
    // decay math on spine-sized rows.
    "q_ewma" -> ((s, dir) => {
      val dayUs = 86400000000L
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"), expr(s"ts_us div $dayUs").as("day"))
        .agg(count(lit(1)).as("cnt"))
      val maxd = daily.groupBy("event_type").agg(max(col("day")).as("maxday"))
      daily.join(maxd, "event_type")
        .withColumn("age", col("maxday") - col("day"))
        .where(col("age") <= 30)
        .withColumn("term9", round(col("cnt") * pow(lit(0.9), col("age")), 9))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("cnt")).as("n_events"),
          sum((col("term9") * 1e9).cast("decimal(38,0)"))
            .cast("long").as("ewma_e9"))
        .select(col("event_type"), col("n_days"), col("n_events"),
          round(col("ewma_e9") / 1e9, 4).as("ewma"))
        .orderBy("event_type")
    }),

    // B13: exact percentiles (linear interpolation, same rule as
    // DuckDB's quantile_cont)
    "q_percentile" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy(col("o_orderpriority"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
          round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
        .orderBy("o_orderpriority")
    }),

    // B45: bounded-state histogram percentile — the 100 TB scale path
    // for B13 (whose exact `percentile` buffers every distinct value
    // per group in one aggregation buffer: a single-executor OOM at
    // scale, not a slow query). $10 cent-buckets cap the histogram at
    // ~60k rows per group NO MATTER the input size; the estimate is
    // within $10 of the exact percentile. See operators/Percentile.
    "q_percentile_hist" -> ((s, dir) => {
      val cents = (dec182("o_totalprice") * 100).cast("long")
      val base = Tables.orders(s, dir)
        .select(col("o_orderpriority"), cents.as("cents"))
      Percentile.histogramPercentiles(base, "o_orderpriority", "cents",
          widthE = 1000L, ps = Seq(0.5, 0.9, 0.99))
        .orderBy("grp")
    }),

    // B45 mergeability: the histogram digest is the persistable form —
    // per-scope digests merged later MUST equal the full scan as an
    // identity. The oracle is the FULL-TABLE histogram SQL, so parity
    // proves sketch-then-merge == scan cross-engine.
    "q_percentile_hist_merged" -> ((s, dir) => {
      val cents = (dec182("o_totalprice") * 100).cast("long")
      val base = Tables.orders(s, dir)
        .select(col("o_orderpriority"), col("o_orderkey"), cents.as("cents"))
      def half(r: Int) =
        base.where(pmod(col("o_orderkey"), lit(2L)) === r)
      val merged = Percentile.mergeDigests(
        Percentile.histogramDigest(half(0), "o_orderpriority", "cents", 1000L),
        Percentile.histogramDigest(half(1), "o_orderpriority", "cents", 1000L))
      Percentile.percentilesFromDigest(merged, 1000L, Seq(0.5, 0.9, 0.99))
        .orderBy("grp")
    }),

    // B14 grouped form: COUNT(DISTINCT customer) per order priority as
    // a per-group HLL — m longs of state per group per task vs the
    // exact form's full (group, key) shuffle. Absent registers are
    // accounted algebraically; no per-group register spine.
    "q_hll_grouped" -> ((s, dir) => {
      Hll.groupedDistinctEstimate(Tables.orders(s, dir),
          "o_orderpriority", col("o_custkey"), m = 64)
        .orderBy("grp")
    }),

    // B14 windowed form: daily distinct users — the DAU monitoring
    // shape; the grouped sketch keyed by day keeps m longs of state
    // per day regardless of event volume.
    "q_hll_windowed" -> ((s, dir) => {
      Hll.groupedDistinctEstimate(
          Tables.events(s, dir).withColumn("day", to_date(col("ts"))),
          "day", col("user_id"), m = 64)
        .orderBy("grp")
    }),

    // B14 mergeability: HLL registers merge by per-register max — an
    // exact identity, so the oracle is the FULL-TABLE sketch SQL. The
    // two scope digests (orderkey parity halves) come from ONE scan via
    // the grouped-register form; merging them is the same per-register
    // max a union of separately-built digests would take.
    "q_hll_merge" -> ((s, dir) => {
      val halves = Tables.orders(s, dir)
        .withColumn("half", pmod(col("o_orderkey"), lit(2L)))
      Hll.estimateFromRegisters(Hll.mergeGroupedRegisters(
        Hll.groupedRegisters(halves, "half", col("o_custkey"))))
    }),

    // B43 scale path: histogram MAD — two bounded-state histogram
    // passes (median estimate, then deviations), |groups|x|buckets|
    // state each, vs the exact form's every-distinct-value buffers.
    // Deviations are doubles; both engines bucket them with identical
    // operands, so buckets agree bitwise. See operators/Percentile.
    "q_mad_hist" -> ((s, dir) => {
      val cents = (dec182("o_totalprice") * 100).cast("long")
      val base = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), cents.as("cents"))
      Percentile.histogramMad(base, "segment", "cents", widthE = 1000L)
        .orderBy("grp")
    }),

    // B43: median absolute deviation per group — the robust dispersion
    // statistic (insensitive to the outlier tails stddev amplifies).
    // Two exact-percentile aggregates with a broadcast median join
    // between them; deviations are exact cent integers minus an at-most
    // .5-fractional median (both dyadic — exactly representable), so
    // the second percentile interpolates identical doubles in both
    // engines (the B13 parity argument applied twice).
    "q_mad" -> ((s, dir) => {
      val cents = (dec182("o_totalprice") * 100).cast("long")
      val base = Tables.orders(s, dir)
        .join(Tables.customer(s, dir).select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), cents.as("cents"))
      val med = base.groupBy(col("segment"))
        .agg(expr("percentile(cents, 0.5)").as("med"))
      base.join(broadcast(med), "segment")
        .withColumn("absdev", abs(col("cents").cast("double") - col("med")))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_orders"),
          round(first(col("med")), 4).as("median_cents"),
          round(expr("percentile(absdev, 0.5)"), 4).as("mad_cents"))
        .orderBy("segment")
    }),

    // B44: time-series similarity search — the 10 most-correlated pairs
    // of per-user daily activity series (the distributed time-series
    // similarity shape: align to a day spine, vectorize per key, score
    // pairs). Every Pearson component (n, Σx, Σx², Σxy) is an EXACT
    // integer — the dot's partial sums stay integer-valued doubles
    // (< 2^53), cast back to long — so the only rounded steps are two
    // sqrt's and one division, identical IEEE in both engines. The pair
    // stage is quadratic in |users| (the KEY dimension, ≪ |events|),
    // and carries the family's in-plan guard (same as neardupPairs'
    // maxRows): more than 100k series fails fast with a pointer to
    // block/LSH the series first, before any pairwise work launches.
    // Vectors are built in one linear pass over the grid. Zero-variance
    // series are filtered exactly (integer comparison).
    "q_ts_similarity" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dayCol = datediff(to_date(col("ts")),
        lit("1970-01-01").cast("date")).cast("long")
      val daily = ev.groupBy(col("user_id"), dayCol.as("day"))
        .agg(count(lit(1)).as("cnt"))
      val guard = daily.agg(count_distinct(col("user_id")).as("__nu"))
        .select(assert_true(col("__nu") <= 100000L,
          concat(lit("q_ts_similarity is an exact all-pairs baseline over "),
            col("__nu").cast("string"),
            lit(" series (> 100000); use SeriesLsh.correlatedPairs " +
              "(q_ts_similarity_lsh) at this scale — sign-LSH bands + " +
              "exact verify, never all-pairs."))).as("__guard"))
      val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val days = bounds.select(explode(sequence(col("d0"), col("d1"))).as("day"))
      val grid = daily.select(col("user_id")).distinct()
        .crossJoin(broadcast(guard)).where(col("__guard").isNull)
        .crossJoin(broadcast(days))
        .join(daily, Seq("user_id", "day"), "left")
        .na.fill(0, Seq("cnt"))
      val vec = grid.groupBy(col("user_id"))
        .agg(expr("transform(array_sort(collect_list(struct(day, cnt))), x -> CAST(x.cnt AS DOUBLE))").as("v"),
          count(lit(1)).as("n"),
          sum(col("cnt")).as("sx"),
          sum(col("cnt") * col("cnt")).as("sxx"))
      val a = vec.select(col("user_id").as("user_a"), col("v").as("va"),
        col("n"), col("sx").as("sxa"), col("sxx").as("sxxa"))
      val b = vec.select(col("user_id").as("user_b"), col("v").as("vb"),
        col("sx").as("sxb"), col("sxx").as("sxxb"))
      val sxy = graft.functions.Vectors.dot(col("va"), col("vb")).cast("long")
      val joined = a.join(b, col("user_a") < col("user_b"))
        .withColumn("sxy", sxy)
        .withColumn("num", col("n") * col("sxy") - col("sxa") * col("sxb"))
        .withColumn("dena", col("n") * col("sxxa") - col("sxa") * col("sxa"))
        .withColumn("denb", col("n") * col("sxxb") - col("sxb") * col("sxb"))
        .where(col("dena") > 0 && col("denb") > 0)
        .withColumn("corr_raw", col("num").cast("double") /
          (sqrt(col("dena").cast("double")) * sqrt(col("denb").cast("double"))))
      joined
        .orderBy(round(col("corr_raw"), 9).desc, col("user_a"), col("user_b"))
        .limit(10)
        .select(col("user_a"), col("user_b"),
          // + 0.0 normalizes IEEE negative zero (SURVEY §6): a tiny
          // negative corr rounds to -0.0 in DuckDB, 0.0 in Spark.
          (round(col("corr_raw"), 4) + lit(0.0)).as("corr"), col("n"))
    }),

    // B14: deterministic HLL distinct-count — the oracle-backed sketch
    // path (Spark's approx_count_distinct has engine-specific register
    // math no oracle can replay). Portable md5 hash, integer rank
    // ladder, EXACT integer harmonic sum (x 2^27); the one double op
    // is the final multiply-divide. Register state is m longs per
    // task at any input size.
    "q_hll_distinct" -> ((s, dir) => {
      Hll.distinctEstimate(Tables.orders(s, dir), col("o_custkey"), m = 64)
    }),

    // B48: HLL set algebra — distinct-customer overlap between the
    // URGENT and LOW priority audiences by inclusion-exclusion over
    // THREE register columns built in one m-row aggregation (one scan,
    // one sketch's worth of shuffle/state — never three passes, never
    // a distinct-pair shuffle). The overlap derives from the rounded
    // component estimates, so the oracle replays it exactly.
    "q_hll_overlap" -> ((s, dir) => {
      Hll.overlapEstimate(Tables.orders(s, dir),
        inA = col("o_orderpriority") === "1-URGENT",
        inB = col("o_orderpriority") === "5-LOW",
        keyCol = col("o_custkey"), m = 64)
    }),

    // B50: multi-granularity HLL — distinct users at FOUR granularities
    // (global, per type, per day, per day×type — the GROUPING SETS of
    // approximate distinct) from ONE scan: each row explodes to its
    // scope labels, then the grouped sketch. State is m longs per
    // scope; the per-day×type cells that would make exact
    // COUNT(DISTINCT) with GROUPING SETS a multi-Expand full shuffle
    // cost 64 longs each here. Scan amplification is ×4 scope labels,
    // collapsed map-side by the register max before the exchange.
    "q_hll_sets" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val day = date_format(col("ts"), "yyyy-MM-dd")
      val scoped = ev.select(explode(array(
          lit("all"),
          concat(lit("type:"), col("event_type")),
          concat(lit("day:"), day),
          concat(lit("day_type:"), day, lit(":"), col("event_type"))))
          .as("scope"),
        col("user_id"))
      Hll.groupedDistinctEstimate(scoped, "scope", col("user_id"), m = 64)
        .orderBy("grp")
    }),

    // B47: count-min sketch — bounded-state per-key frequency. The
    // build shuffles ≤ depth·width cells per partition regardless of
    // input size; estimates join the ≤1k-row digest as a broadcast.
    // Output pairs the exact count with the CMS estimate, so the
    // over-count-only contract is visible in the result itself.
    "q_cms_freq" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"))
      val sketch = Cms.digest(ev, "user_id")
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      exact
        .join(Cms.estimates(sketch, exact.select("user_id"), "user_id"),
          "user_id")
        .orderBy("user_id")
    }),

    // B47 merge: per-scope digests from ONE scan (grouped build, the
    // q_hll_merge pattern) merge cell-wise into exactly the full-scan
    // sketch — the oracle computes the single-sketch estimates, so
    // parity IS the merge identity, cross-engine.
    "q_cms_merge" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), pmod(col("user_id"), lit(2L)).as("half"))
      val grouped = Cms.groupedDigest(ev, "half", "user_id")
        .localCheckpoint() // both halves filter this ≤2·depth·width frame
      def half(h: Int) = grouped.where(col("half") === h)
        .select("row", "col", "cnt")
      val merged = Cms.merge(half(0), half(1))
      val keys = ev.select("user_id").distinct()
      Cms.estimates(merged, keys, "user_id").orderBy("user_id")
    }),

    // B58: threshold heavy hitters — CMS prefilter + exact rescan.
    // CMS estimates never UNDER-count, so `est >= T` keeps every truly
    // frequent part (no false negatives); the exact rescan counts only
    // rows whose key survives the broadcast candidate semi-join and
    // drops the inflated ones, so the output is EXACT and the oracle is
    // a plain HAVING — the sketch is pure plan structure. At 100 TB the
    // full-key count shuffle becomes a hot-keys-only shuffle.
    "q_cms_heavy" -> ((s, dir) => {
      Cms.heavyHitters(
          Tables.lineitem(s, dir).select(col("l_partkey")),
          "l_partkey", minCount = 45L)
        .select(col("l_partkey"), col("n").as("n_items"))
        .orderBy(desc("n_items"), col("l_partkey"))
    }),

    // B58 at BOUNDED candidate state (VERDICT r12 ask #8 graded
    // cross-engine): the same exact heavy hitters, but the pigeonhole
    // candidate stage runs as a Misra-Gries summary of ≤32k counters
    // per partition — O(capacity) memory however key-explosive the
    // partition (capacity ≥ partitionRows/floor keeps the
    // per-partition losslessness check green: ~600k rows / floor 45
    // needs ≥14k at sf0.1; 32k holds to sf1). Output is EXACT either
    // way, so the oracle is q_cms_heavy's: parity proves the bounded
    // summary loses no candidate on real data.
    "q_cms_heavy_mg" -> ((s, dir) => {
      Cms.heavyHitters(
          Tables.lineitem(s, dir).select(col("l_partkey")),
          "l_partkey", minCount = 45L, mgCapacity = Some(1 << 15))
        .select(col("l_partkey"), col("n").as("n_items"))
        .orderBy(desc("n_items"), col("l_partkey"))
    }),

    // B61: event-type transition matrix — first-order Markov counts +
    // row-normalized probabilities over each user's ts-ordered stream
    // (the journey model behind next-event prediction and funnel
    // design; B38's path trigrams are the order-2 cousin). One
    // user-partitioned window (lead) + one grouped count on the tiny
    // |types|² grain; probabilities are exact small-integer divisions
    // on the aggregate, so round(4) is engine-stable.
    "q_markov" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      val trans = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .where(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val totals = trans.groupBy("from_type")
        .agg(sum(col("n")).as("row_n"))
      trans.join(totals, "from_type")
        .select(col("from_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / col("row_n"), 4).as("p"))
        .orderBy("from_type", "next_type")
    }),

    // B60: sketch-based join-size estimation — the AMS/CMS inner
    // product (min over depth rows of the cell-wise counter dot) prices
    // an equi-join BEFORE running it, from mergeable ≤depth·width-long
    // digests; the exact Σ n_a·n_b ground truth sits beside it so the
    // report grades its own estimator (est ≥ exact always — collisions
    // only add). Two classic pairs: the FK join and the 1:N customer
    // fan-out.
    "q_join_estimate" -> ((s, dir) => {
      val ol = Cms.joinSizeEstimate(
        Tables.orders(s, dir).select(col("o_orderkey")), "o_orderkey",
        Tables.lineitem(s, dir).select(col("l_orderkey")), "l_orderkey")
        .select(lit("orders_lineitem").as("pair"),
          col("n_exact"), col("n_est"))
      val co = Cms.joinSizeEstimate(
        Tables.customer(s, dir).select(col("c_custkey")), "c_custkey",
        Tables.orders(s, dir).select(col("o_custkey")), "o_custkey")
        .select(lit("customer_orders").as("pair"),
          col("n_exact"), col("n_est"))
      ol.unionAll(co).orderBy("pair")
    }),

    // B46: LSH-blocked time-series similarity — the 100 TB scale path
    // for B44's guarded all-pairs baseline. Sign-random-projection
    // bands (exact-integer bit rule, md5-derived ±1 components shared
    // with the oracle) generate candidates via a (band, key) equi-join
    // with a hot-bucket cap; candidates verify with the SAME
    // exact-integer Pearson as the baseline. No quadratic stage.
    "q_ts_similarity_lsh" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val dayCol = datediff(to_date(col("ts")),
        lit("1970-01-01").cast("date")).cast("long")
      val daily = ev.groupBy(col("user_id"), dayCol.as("day"))
        .agg(count(lit(1)).as("cnt"))
      // 5 bands x 6 bits: 64 buckets/band keeps candidate pairs ~7x
      // sparser than the 16-bucket default — the operating point for
      // HIGH-correlation discovery (recall ~0.99 at rho 0.97, ~0.92 at
      // 0.9; mid-correlation recall is the documented trade). Both
      // engines derive the same bands, so parity is unaffected.
      SeriesLsh.correlatedPairs(daily, threshold = 0.5,
          nBits = 30, bitsPerBand = 6)
        .orderBy(desc("corr"), col("user_a"), col("user_b"))
    }),

    // B19: statistical aggregates — stddev / correlation / covariance
    // (rounded at the boundary; parallel float aggregation noise is
    // ~1e-15 relative, far below round(4)). The `+ 0.0` normalizes IEEE
    // negative zero: DuckDB covar can yield -0.0 where Spark gives 0.0 —
    // equal under SQL `=` but distinct under the driver's string hash.
    // B71: table profiling — the ANALYZE-equivalent stats report an
    // optimizer or data catalog collects: per column, row/null counts,
    // EXACT distinct cardinality, and typed min/max. min/max/counts
    // partial-agg in ONE scan to a checkpointed 1-row frame; ndv runs
    // as one PARALLEL distinct branch per column (column-pruned scan →
    // map-side partial dedup → distributed distinct → count) — the
    // single no-group multi-distinct alternative funnels every distinct
    // value of every column through ONE reducer (measured 22 s vs 1.5 s
    // at sf0.1; the same reason ANALYZE ... FOR COLUMNS profiles
    // per-column). min/max surface as doubles/strings — they SELECT
    // existing values, so both engines emit identical bits with no
    // rounding ladder. Each report row is a 1-row × 1-row join of the
    // stats frame with its column's ndv (documented BNLJ).
    "q_table_profile" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      def numE(c: String) = col(c).cast("double")
      // parquet timestamps load as NTZ; the UTC session makes the cast
      // epoch-preserving, matching DuckDB's epoch_us
      def tsE(c: String) = unix_micros(col(c).cast("timestamp")).cast("double")
      val aggs = Seq(count(lit(1)).as("n_rows")) ++
        (profNumCols.map(c => (c, numE(c))) ++ profTsCols.map(c => (c, tsE(c))))
          .flatMap { case (c, e) => Seq(
            count(col(c)).as(s"nn_$c"),
            min(e).as(s"mn_$c"), max(e).as(s"mx_$c")) } ++
        profStrCols.flatMap(c => Seq(
          count(col(c)).as(s"nn_$c"),
          min(col(c)).as(s"ms_$c"), max(col(c)).as(s"xs_$c")))
      val row = li.agg(aggs.head, aggs.tail: _*).localCheckpoint()
      def ndv(c: String) = li.select(col(c)).distinct()
        .agg(count(col(c)).as("n_distinct"))
      val dt = li.schema.fields
        .map(f => f.name -> graft.cdc.SchemaEvolution.dialectType(f.dataType))
        .toMap
      val parts = (profNumCols ++ profTsCols).map(c =>
          ndv(c).crossJoin(broadcast(row)).select(
            lit(c).as("col_name"), lit(dt(c)).as("dtype"), col("n_rows"),
            (col("n_rows") - col(s"nn_$c")).as("n_null"), col("n_distinct"),
            col(s"mn_$c").as("min_num"), col(s"mx_$c").as("max_num"),
            lit(null).cast("string").as("min_str"),
            lit(null).cast("string").as("max_str"))) ++
        profStrCols.map(c =>
          ndv(c).crossJoin(broadcast(row)).select(
            lit(c).as("col_name"), lit(dt(c)).as("dtype"), col("n_rows"),
            (col("n_rows") - col(s"nn_$c")).as("n_null"), col("n_distinct"),
            lit(null).cast("double").as("min_num"),
            lit(null).cast("double").as("max_num"),
            col(s"ms_$c").as("min_str"), col(s"xs_$c").as("max_str")))
      parts.reduce(_ unionAll _).orderBy("col_name")
    }),

    // B69: exact per-group OLS trend — slope/intercept of daily event
    // volume per type, the drift detector a metrics pipeline runs.
    // Closed-form least squares over (day, count) points kept as exact
    // integer moment sums (n, Σx, Σy, Σx², Σxy — one map-side-combined
    // shuffle, O(|groups|) state; engine float regr_slope would differ
    // in summation order); slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) and
    // intercept share one positive denominator, emitted e6-scaled via
    // the exact-rational half-away rounding ladder (sign-split so both
    // engines' integral division sees only non-negative operands —
    // Spark div truncates, DuckDB // floors; they agree only there).
    "q_ols_trend" -> ((s, dir) => {
      def halfAwayE6(c: String, d: String) =
        s"CASE WHEN ($c) >= 0 THEN (2000000 * ($c) + $d) div (2 * ($d)) " +
          s"ELSE -((2000000 * (-($c)) + $d) div (2 * ($d))) END"
      Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("ts_us div 86400000000").as("x"))
        .agg(count(lit(1)).as("y"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * y")).as("sxy"))
        .selectExpr("event_type", "n",
          "CAST(n AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sx AS den",
          "CAST(n AS DECIMAL(38,0)) * sxy - CAST(sx AS DECIMAL(38,0)) * sy AS snum",
          "CAST(sy AS DECIMAL(38,0)) * sxx - CAST(sx AS DECIMAL(38,0)) * sxy AS inum")
        .where(col("den") > 0)
        .selectExpr("event_type", "n AS n_days",
          halfAwayE6("snum", "den") + " AS slope_e6",
          halfAwayE6("inum", "den") + " AS intercept_e6")
        .orderBy("event_type")
    }),

    "q_stats_agg" -> ((s, dir) => {
      def r4(c: Column) = round(c, 4) + lit(0.0)
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          r4(stddev_samp(col("l_quantity"))).as("sd_qty"),
          r4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qty_price"),
          r4(covar_samp(col("l_discount"), col("l_tax"))).as("cov_disc_tax"),
          r4(avg(col("l_extendedprice"))).as("avg_price"))
        .orderBy("l_returnflag")
    }),

    // B20: deterministic array aggregation — per-customer sorted order
    // lists (sort_array makes collect_list order-insensitive). Serialized
    // to a csv string at the output boundary: array-typed columns crash
    // the driver's pandas comparison (unhashable numpy.ndarray — r2).
    "q_array_agg" -> ((s, dir) => {
      Tables.orders(s, dir)
        .where(col("o_totalprice") > 400000)
        .groupBy(col("o_custkey"))
        .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",")
          .as("orderkeys"))
        .orderBy("o_custkey")
    }),

    // B17: pivot — per-day event-type counts as columns (explicit value
    // list so the plan needs no discovery pass)
    "q_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(unix_micros(date_trunc("day", col("ts"))).as("day_us"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L)
        .orderBy("day_us")
    }),

    // B18: set operations — INTERSECT / EXCEPT segment counts
    "q_setops" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val h1 = o.where(col("o_orderdate") >= ts("1996-01-01")
        && col("o_orderdate") < ts("1996-07-01")).select("o_custkey")
      val h2 = o.where(col("o_orderdate") >= ts("1996-07-01")
        && col("o_orderdate") < ts("1997-01-01")).select("o_custkey")
      def seg(name: String, df: org.apache.spark.sql.DataFrame) =
        df.agg(count(lit(1)).as("n_custs")).select(lit(name).as("segment"), col("n_custs"))
      seg("both", h1.intersect(h2))
        .unionAll(seg("h1_only", h1.except(h2)))
        .unionAll(seg("h2_only", h2.except(h1)))
        .orderBy("segment")
    }),

    // B16: extended window functions — lead/lag, ntile, cume_dist over
    // one shared (key, order) sort
    "q_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, dir)
        .select(
          col("o_custkey"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("order_ts_us"),
          lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
          ntile(4).over(w).cast("long").as("quartile"),
          round(cume_dist().over(w), 4).as("cdist"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // B15: bucketed range join — clicks within the hour before each
    // purchase, as a (key, bucket) equi-join + exact filter (never a
    // theta/nested-loop product)
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id").as("seq"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("seq"))
      graft.operators.RangeJoin.countPriorWithin(
        purchases, clicks, key = "user_id", tsUs = "ts_us", seq = "seq",
        windowUs = 3600L * 1000000)
        .select(col("seq").as("purchase_seq"), col("user_id"),
          col("ts_us"), col("n_matches"))
        .orderBy("purchase_seq")
    }),

    // B10: as-of join — attribute each purchase to the latest prior click
    "q_asof_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id").as("seq"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("seq"))
      AsOf.joinPrior(purchases, clicks,
        key = "user_id", ts = "ts_us", seq = "seq",
        rightPayload = Map("seq" -> "click_seq", "ts_us" -> "click_ts_us"))
        .select(col("seq").as("purchase_seq"), col("user_id"),
          col("ts_us").as("purchase_ts_us"), col("value"),
          col("click_seq"), col("click_ts_us"))
        .orderBy("purchase_seq")
    }),

    // B10 extension (B56): nearest-direction as-of join — each purchase
    // attaches the click CLOSEST in time either way (backward wins ties).
    // Same union + one-shuffle-per-key window plan as q_asof_join with a
    // second (forward) frame; the naive |ts delta| theta join + argmin is
    // quadratic per key and never survives 100 TB.
    "q_asof_nearest" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id").as("seq"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("seq"))
      AsOf.joinNearest(purchases, clicks,
        key = "user_id", ts = "ts_us", seq = "seq",
        rightPayload = Map("seq" -> "click_seq"))
        .select(col("seq").as("purchase_seq"), col("user_id"),
          col("ts_us").as("purchase_ts_us"), col("click_seq"),
          col("matched_ts").as("click_ts_us"), col("direction"),
          when(col("matched_ts").isNotNull,
            abs(col("ts_us") - col("matched_ts"))).as("dist_us"))
        .orderBy("purchase_seq")
    }),

    // B40: RANGE-frame window — 30-day trailing spend per customer at
    // each order date (range frames bound by VALUE, not row count; the
    // window partitions per customer so no global sort exists). Cents
    // stay exact integers; day arithmetic is epoch-day longs.
    "q_trailing_spend" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = (dec182("o_totalprice") * 100).cast("decimal(38,0)")
        .cast("long")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day"))
        .rangeBetween(-29, Window.currentRow)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
            .cast("long").as("day"),
          cents.as("cents"))
        .withColumn("trailing_30d_cents", sum(col("cents")).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("day"),
          col("cents"), col("trailing_30d_cents"))
        .orderBy("o_custkey", "day", "o_orderkey")
    }),

    // B39: 10%-trimmed mean order value per segment — robust central
    // tendency without the outlier tails. Deterministic trim: rank by
    // (cents, orderkey) inside a window partitioned per segment, drop
    // floor(n/10) rows from each end; the mean is an exact integer
    // cent-sum over the kept rows divided at the end.
    // Group-cardinality contract (SURVEY §5): each group sorts in ONE
    // reducer — right for many-or-small groups; for few huge groups
    // reshape via the B45 histogram (broadcast p10/p90 boundary
    // buckets + scan-local keep + exact ranking only inside the two
    // boundary buckets).
    "q_trimmed_mean" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val cents = (dec182("o_totalprice") * 100).cast("decimal(38,0)")
        .cast("long")
      val bySeg = Window.partitionBy(col("segment"))
      val w = bySeg.orderBy(col("cents"), col("o_orderkey"))
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
          cents.as("cents"))
        .withColumn("rn", row_number().over(w))
        .withColumn("cnt", count(lit(1)).over(bySeg))
        .where(col("rn") > floor(col("cnt") / 10) &&
          col("rn") <= col("cnt") - floor(col("cnt") / 10))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_kept"),
          round(sum(col("cents")).cast("double")
            / count(lit(1)) / 100.0, 4).as("trimmed_mean"))
        .orderBy("segment")
    }),

    // B39 reshape: EXACT trimmed mean with no per-group full sort —
    // histogram sums drop whole buckets outside the trim ranks;
    // only the ≤2 boundary buckets per group are ranked. Same answer
    // as q_trimmed_mean (the oracle IS the plain windowed SQL), plan
    // survives few-and-huge groups.
    "q_trimmed_mean_hist" -> ((s, dir) => {
      val cents = (dec182("o_totalprice") * 100).cast("decimal(38,0)")
        .cast("long")
      val base = Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
          cents.as("cents"))
      Percentile.histogramTrimmedMean(base, "segment", "cents",
          "o_orderkey", widthE = 1000L)
        .orderBy("grp")
    }),

    // B38: top event paths — the 10 most common 3-step event-type
    // sequences across per-user streams (path/journey analysis). Two
    // lead() windows share ONE per-user sort; the trigram count is a
    // partial-agg shuffle of tiny strings; the global top-10 is a
    // TakeOrderedAndProject (per-partition heap, never a full sort),
    // deterministic via the (count desc, path) total order.
    "q_event_paths" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .where(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("path"))
        .limit(10)
    }),

    // B37: as-of join with a staleness bound (pandas merge_asof
    // `tolerance`): clicks older than 1 h before the purchase null
    // out — same union+window plan, the bound is a scan-local gate
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val purchases = ev.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us"), col("event_id").as("seq"), col("value"))
      val clicks = ev.where(col("event_type") === "click")
        .select(col("user_id"), col("ts_us"), col("event_id").as("seq"))
      AsOf.joinPriorWithin(purchases, clicks,
          key = "user_id", ts = "ts_us", seq = "seq",
          rightPayload = Map("seq" -> "click_seq"),
          toleranceUs = asofToleranceUs)
        .select(col("seq").as("purchase_seq"), col("user_id"),
          col("ts_us").as("purchase_ts_us"), col("value"),
          col("click_seq"), col("matched_ts").as("click_ts_us"))
        .orderBy("purchase_seq")
    }))

  val oracles: Map[String, String] = Map(

    "q1_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
        |  ${sumFixedSql("CAST(l_quantity AS DECIMAL(18,2))", 2)} AS sum_qty_e2,
        |  ${sumFixedSql("CAST(l_extendedprice AS DECIMAL(18,2))", 2)} AS sum_base_price_e2,
        |  ${sumFixedSql(discPriceSql, 4)} AS sum_disc_price_e4,
        |  ${sumFixedSql(s"CAST($discPriceSql * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(18,6))", 6)} AS sum_charge_e6,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q6_revenue_filter" ->
      s"""SELECT
        |  ${sumFixedSql("CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))", 4)} AS revenue_e4,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "q3_top_shipping" ->
      s"""SELECT l_orderkey,
        |  ${sumFixedSql(discPriceSql, 4)} AS revenue_e4,
        |  epoch_us(o_orderdate) AS o_orderdate_us
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue_e4 DESC, o_orderdate_us, l_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      s"""SELECT n_name,
        |  ${sumFixedSql(discPriceSql, 4)} AS revenue_e4
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        |  FROM orders) t
        |WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,

    "q_topk_customers" ->
      s"""SELECT o_custkey,
        |  ${sumFixedSql("CAST(o_totalprice AS DECIMAL(18,2))", 2)} AS total_spend_e2,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_custkey
        |ORDER BY total_spend_e2 DESC, o_custkey LIMIT 25""".stripMargin,

    "q_semi_join" ->
      """SELECT c_nationkey, count(*) AS n_customers
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
        |                    AND o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,

    "q_distinct_agg" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs,
        |       count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // the oracle aggregates the BASE table — parity proves the routed
    // (summary-served) plan answers exactly what the base scan would
    "q_summary_route" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |       max(o_totalprice) AS max_price,
        |       min(o_totalprice) AS min_price
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_sample_estimate" -> {
      val bucket = graft.operators.Sampling.bucketSql(
        "CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)",
        16)
      s"""WITH x AS (
        |  SELECT l_returnflag,
        |    ${sumFixedSql("CAST(l_extendedprice AS DECIMAL(18,2))", 2)}
        |      AS exact_e2,
        |    count(*) AS n_rows
        |  FROM lineitem GROUP BY 1),
        |e AS (
        |  SELECT l_returnflag,
        |    CAST(${sumFixedSql("CAST(l_extendedprice AS DECIMAL(18,2))", 2)}
        |      * 16 AS BIGINT) AS est_e2,
        |    CAST(count(*) * 16 AS BIGINT) AS est_rows
        |  FROM lineitem WHERE $bucket = 0 GROUP BY 1)
        |SELECT x.l_returnflag, x.n_rows, x.exact_e2,
        |  coalesce(e.est_rows, 0) AS est_rows,
        |  coalesce(e.est_e2, 0) AS est_e2,
        |  CAST((10000 * abs(coalesce(e.est_e2, 0) - x.exact_e2))
        |    // x.exact_e2 AS BIGINT) AS abs_err_e4
        |FROM x LEFT JOIN e USING (l_returnflag)
        |ORDER BY l_returnflag""".stripMargin
    },

    // the PLAIN join aggregate: parity proves the bloom reduction is
    // result-invisible
    "q_bloom_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
        |  ${sumFixedSql("CAST(l_quantity AS DECIMAL(18,2))", 2)} AS sum_qty_e2
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_rollup" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       ${sumFixedSql("CAST(l_quantity AS DECIMAL(18,2))", 2)} AS sum_qty_e2,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q_rollup_gid" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
        |       ${sumFixedSql("CAST(l_quantity AS DECIMAL(18,2))", 2)} AS sum_qty_e2,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, returnflag, linestatus""".stripMargin,

    "q_cube" ->
      s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       ${sumFixedSql("CAST(l_extendedprice AS DECIMAL(18,2))", 2)} AS sum_price_e2,
        |       count(*) AS n_rows
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin,

    "q_grouping_sets" ->
      s"""WITH b AS (
        |  SELECT l_returnflag, l_linestatus, l_quantity,
        |         CAST(year(CAST(l_shipdate AS DATE)) AS BIGINT) AS shipyear
        |  FROM lineitem)
        |SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |       coalesce(l_linestatus, 'ALL') AS linestatus,
        |       coalesce(shipyear, -1) AS shipyear,
        |       CAST(GROUPING(l_returnflag, l_linestatus, shipyear)
        |            AS BIGINT) AS gid,
        |       ${sumFixedSql("CAST(l_quantity AS DECIMAL(18,2))", 2)} AS sum_qty_e2,
        |       count(*) AS n_rows
        |FROM b
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |                        (shipyear), ())
        |ORDER BY gid, returnflag, linestatus, shipyear""".stripMargin,

    "q9_part_profit" ->
      s"""SELECT n_name, p_brand,
        |  ${sumFixedSql(discPriceSql, 4)} AS profit_e4,
        |  count(*) AS n_items
        |FROM lineitem, part, supplier, nation
        |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND s_nationkey = n_nationkey AND p_size <= 20
        |GROUP BY n_name, p_brand
        |ORDER BY n_name, p_brand""".stripMargin,

    "q4_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey
        |                AND l.l_shipdate > o.o_orderdate)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |  ${sumFixedSql(discPriceSql, 4)} AS revenue_e4
        |FROM lineitem, orders, customer, supplier, nation n1, nation n2
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND l_suppkey = s_suppkey
        |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
        |  AND n1.n_name IN ('NATION_3', 'NATION_7')
        |  AND n2.n_name IN ('NATION_3', 'NATION_7')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q10_returned_top" ->
      s"""SELECT c_custkey, c_name, n_name,
        |  ${sumFixedSql(discPriceSql, 4)} AS revenue_e4,
        |  max(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS acctbal_e2
        |FROM lineitem, orders, customer, nation
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey AND l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |GROUP BY 1, 2, 3
        |ORDER BY revenue_e4 DESC, c_custkey LIMIT 20""".stripMargin,

    "q14_promo_share" ->
      s"""SELECT promo_revenue_e4, total_revenue_e4,
        |  round(100.0 * promo_revenue_e4 / total_revenue_e4, 4) AS promo_share
        |FROM (
        |  SELECT
        |    ${sumFixedSql(
                s"CASE WHEN p_type = 'PROMO' THEN $discPriceSql ELSE CAST(0 AS DECIMAL(18,4)) END", 4)}
        |      AS promo_revenue_e4,
        |    ${sumFixedSql(discPriceSql, 4)} AS total_revenue_e4
        |  FROM lineitem, part
        |  WHERE l_partkey = p_partkey
        |    AND l_shipdate >= TIMESTAMP '1996-09-01'
        |    AND l_shipdate < TIMESTAMP '1996-10-01')""".stripMargin,

    "q17_small_qty" ->
      """WITH avgq AS (
        |  SELECT l_partkey AS ap,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS DOUBLE)
        |      / (100.0 * count(*)) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS BIGINT)
        |    AS sum_price_e2,
        |  count(*) AS n_items
        |FROM lineitem l
        |JOIN part p ON l.l_partkey = p.p_partkey
        |JOIN avgq ON l.l_partkey = avgq.ap
        |WHERE p.p_brand = 'Brand#23' AND l.l_quantity < 0.2 * avg_qty""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS BIGINT)
        |      AS sum_qty_e2
        |  FROM lineitem GROUP BY 1
        |  HAVING CAST(sum(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS BIGINT) > 25000)
        |SELECT c_name, c_custkey, o_orderkey,
        |  epoch_us(o_orderdate) AS o_orderdate_us,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS o_totalprice_e2,
        |  sum_qty_e2
        |FROM orders JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice_e2 DESC, o_orderkey LIMIT 20""".stripMargin,

    "q19_disjunctive" ->
      s"""SELECT ${sumFixedSql(discPriceSql, 4)} AS revenue_e4,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

    "q22_churned_customers" ->
      """WITH avg_bal AS (
        |  SELECT CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS DOUBLE)
        |           / (100.0 * count(*)) AS avg_bal
        |  FROM customer WHERE c_acctbal > 0),
        |recent AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |SELECT n_name, count(*) AS n_custs,
        |  CAST(sum(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS DECIMAL(38,0))) AS BIGINT)
        |    AS sum_acctbal_e2
        |FROM customer, nation, avg_bal
        |WHERE c_nationkey = n_nationkey AND c_acctbal > avg_bal
        |  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q2_min_cost_supp" ->
      """WITH euro AS (
        |  SELECT s_suppkey, s_name, s_acctbal, n_name
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |offers AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 10000 AS BIGINT)
        |        // CAST(l_quantity AS BIGINT)) AS cost_e4,
        |    min(s_name) AS s_name, min(s_acctbal) AS s_acctbal,
        |    min(n_name) AS n_name
        |  FROM lineitem JOIN euro ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |mc AS (
        |  SELECT l_partkey AS mc_partkey, min(cost_e4) AS min_cost_e4
        |  FROM offers GROUP BY 1)
        |SELECT CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS s_acctbal_e2,
        |  s_name, n_name, p_partkey, p_brand, cost_e4
        |FROM offers
        |JOIN mc ON l_partkey = mc_partkey AND cost_e4 = min_cost_e4
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'STANDARD' AND p_size <= 10
        |ORDER BY s_acctbal_e2 DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q11_important_stock" ->
      s"""WITH vals AS (
        |  SELECT l_partkey,
        |    ${sumFixedSql("CAST(l_extendedprice AS DECIMAL(18,2))", 2)} AS value_e2
        |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'
        |  GROUP BY 1),
        |tot AS (SELECT CAST(sum(value_e2) AS BIGINT) AS total_e2 FROM vals)
        |SELECT l_partkey, value_e2 FROM vals, tot
        |WHERE value_e2 * 1000 > total_e2
        |ORDER BY value_e2 DESC, l_partkey""".stripMargin,

    "q12_ship_priority" ->
      """SELECT l_returnflag,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        |  sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END)::BIGINT AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#45' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,

    "q20_excess_supply" ->
      s"""WITH qty AS (
        |  SELECT l_partkey, l_suppkey,
        |    ${sumFixedSql("CAST(l_quantity AS DECIMAL(18,2))", 2)} AS qty_e2
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE '%gear%'
        |    AND l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-01-01'
        |  GROUP BY 1, 2),
        |dom AS (
        |  SELECT DISTINCT l_suppkey FROM (
        |    SELECT l_suppkey, qty_e2,
        |      sum(qty_e2) OVER (PARTITION BY l_partkey) AS tot_e2
        |    FROM qty)
        |  WHERE qty_e2 * 2 > tot_e2)
        |SELECT s_name, n_name,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |    AS s_acctbal_e2
        |FROM supplier JOIN dom ON s_suppkey = l_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_name""".stripMargin,

    "q8_market_share" ->
      s"""WITH vol AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    ${sumFixedSql(s"CASE WHEN n2.n_name = 'NATION_3' THEN $discPriceSql ELSE CAST(0 AS DECIMAL(18,4)) END", 4)} AS nation_volume_e4,
        |    ${sumFixedSql(discPriceSql, 4)} AS total_volume_e4
        |  FROM lineitem
        |    JOIN part ON l_partkey = p_partkey
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |    JOIN region ON n1.n_regionkey = r_regionkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
        |    AND o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY 1)
        |SELECT o_year, nation_volume_e4, total_volume_e4,
        |  round(100.0 * nation_volume_e4 / total_volume_e4, 4) AS mkt_share
        |FROM vol ORDER BY o_year""".stripMargin,

    "q13_cust_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
        |  SELECT l_suppkey,
        |    ${sumFixedSql(discPriceSql, 4)} AS total_revenue_e4
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue_e4
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

    "q21_waiting_suppliers" ->
      """SELECT s_name, count(*) AS numwait FROM (
        |  SELECT DISTINCT l1.l_suppkey, l1.l_orderkey
        |  FROM lineitem l1
        |  JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |  WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
        |    AND EXISTS (
        |      SELECT 1 FROM lineitem l2
        |      WHERE l2.l_orderkey = l1.l_orderkey
        |        AND l2.l_suppkey <> l1.l_suppkey)
        |    AND NOT EXISTS (
        |      SELECT 1 FROM lineitem l3
        |      WHERE l3.l_orderkey = l1.l_orderkey
        |        AND l3.l_suppkey <> l1.l_suppkey
        |        AND l3.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)) w
        |JOIN supplier ON w.l_suppkey = s_suppkey
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,

    "q_not_in" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT DISTINCT CASE WHEN o_totalprice > 400000 THEN o_custkey END
        |  FROM orders
        |  WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,

    "q_gapfill" ->
      s"""WITH daily AS (
        |  SELECT c_mktsegment AS segment, CAST(o_orderdate AS DATE) AS day,
        |    ${sumFixedSql("CAST(o_totalprice AS DECIMAL(18,2))", 2)} AS rev_c
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |bounds AS (
        |  SELECT min(CAST(o_orderdate AS DATE)) AS d0,
        |         max(CAST(o_orderdate AS DATE)) AS d1 FROM orders),
        |days AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
        |  FROM bounds),
        |segs AS (SELECT DISTINCT c_mktsegment AS segment FROM customer),
        |spine AS (SELECT segment, day FROM segs, days),
        |filled AS (
        |  SELECT segment, day, coalesce(rev_c, 0) AS revenue_cents
        |  FROM spine LEFT JOIN daily USING (segment, day))
        |SELECT segment, strftime(day, '%Y-%m-%d') AS day, revenue_cents,
        |  CAST(sum(revenue_cents) OVER (
        |    PARTITION BY segment ORDER BY day
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS revenue_7d_cents
        |FROM filled ORDER BY segment, day""".stripMargin,

    "q_yoy" ->
      s"""WITH monthly AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |         CAST(month(o_orderdate) AS INT) AS mo,
        |    ${sumFixedSql("CAST(o_totalprice AS DECIMAL(18,2))", 2)}
        |      AS revenue_cents
        |  FROM orders GROUP BY 1, 2)
        |SELECT a.yr, a.mo, a.revenue_cents,
        |       b.revenue_cents AS prev_year_cents,
        |       round((a.revenue_cents - b.revenue_cents) * 100.0
        |             / b.revenue_cents, 4) + 0.0 AS yoy_pct
        |FROM monthly a LEFT JOIN monthly b
        |  ON a.yr * 12 + a.mo = b.yr * 12 + b.mo + 12
        |ORDER BY a.yr, a.mo""".stripMargin,

    "q_salted_join" ->
      s"""SELECT c_mktsegment AS segment, count(*) AS n_orders,
        |  ${sumFixedSql("CAST(o_totalprice AS DECIMAL(18,2))", 2)}
        |    AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_skew_report" ->
      Skew.keyProfileSql("lineitem", "l_partkey", topK = 10),

    "q_attribution" ->
      """WITH p AS (
        |  SELECT user_id, epoch_us(ts) AS p_ts, event_id AS p_id
        |  FROM events WHERE event_type = 'purchase'),
        |t AS (
        |  SELECT user_id, epoch_us(ts) AS t_ts, event_type AS touch_type,
        |         event_id AS t_id
        |  FROM events WHERE event_type IN ('view', 'click')),
        |j AS (
        |  SELECT p.p_id, t.touch_type, t.t_ts, t.t_id
        |  FROM p JOIN t ON p.user_id = t.user_id
        |   AND t.t_ts <= p.p_ts AND t.t_ts > p.p_ts - 604800000000),
        |r AS (
        |  SELECT *, count(*) OVER (PARTITION BY p_id) AS n,
        |         row_number() OVER (PARTITION BY p_id
        |                            ORDER BY t_ts, t_id) AS rnk
        |  FROM j),
        |c AS (
        |  SELECT touch_type, 10000 // n AS linear_e4,
        |         CASE WHEN n = 1 THEN 10000
        |              WHEN n = 2 THEN 5000
        |              WHEN rnk = 1 OR rnk = n THEN 4000
        |              ELSE 2000 // (n - 2) END AS pos_e4
        |  FROM r)
        |SELECT touch_type, count(*) AS n_touches,
        |       CAST(sum(linear_e4) AS BIGINT) AS linear_credit_e4,
        |       CAST(sum(pos_e4) AS BIGINT) AS positional_credit_e4
        |FROM c GROUP BY touch_type ORDER BY touch_type""".stripMargin,

    "q_funnel" ->
      """WITH fv AS (
        |  SELECT user_id, min(epoch_us(ts)) AS view_ts
        |  FROM events WHERE event_type = 'view' GROUP BY user_id),
        |fc AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS click_ts
        |  FROM events e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > fv.view_ts
        |  GROUP BY e.user_id),
        |fp AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS purchase_ts
        |  FROM events e JOIN fc ON e.user_id = fc.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fc.click_ts
        |  GROUP BY e.user_id)
        |SELECT '1_view' AS stage, count(*) AS n_users FROM fv
        |UNION ALL SELECT '2_click', count(*) FROM fc
        |UNION ALL SELECT '3_purchase', count(*) FROM fp
        |ORDER BY stage""".stripMargin,

    "q_mode_user" ->
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, user_id, n,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY n DESC, user_id) AS rk
        |  FROM c)
        |SELECT event_type, user_id AS top_user, n AS top_n
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    "q_burstiness" ->
      """WITH g AS (
        |  SELECT user_id,
        |    (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id)) // 1000000 AS gap
        |  FROM events),
        |p AS (
        |  SELECT user_id, count(*) AS n, sum(gap) AS sm,
        |         sum(gap * gap) AS sq
        |  FROM g WHERE gap IS NOT NULL
        |  GROUP BY 1 HAVING count(*) >= 3),
        |c AS (
        |  SELECT user_id,
        |    CASE WHEN CAST(sm AS DOUBLE) / n > 0 THEN
        |      sqrt((CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE) * sm / n)
        |           / (n - 1)) / (CAST(sm AS DOUBLE) / n)
        |    ELSE 0 END AS cv
        |  FROM p)
        |SELECT CAST(floor(cv * 2) AS BIGINT) AS cv_bucket,
        |       count(*) AS n_users
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_funnel_latency" ->
      """WITH fv AS (
        |  SELECT user_id, min(epoch_us(ts)) AS view_ts
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |fc AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS click_ts,
        |         min(fv.view_ts) AS view_ts
        |  FROM events e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > fv.view_ts
        |  GROUP BY 1),
        |fp AS (
        |  SELECT e.user_id, min(epoch_us(e.ts)) AS purchase_ts,
        |         min(fc.view_ts) AS view_ts
        |  FROM events e JOIN fc ON e.user_id = fc.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > fc.click_ts
        |  GROUP BY 1),
        |a AS (
        |  SELECT count(*) AS n, list_sort(list(purchase_ts - view_ts)) AS v,
        |         max(purchase_ts - view_ts) AS max_us
        |  FROM fp)
        |SELECT n AS n_converted,
        |  CASE WHEN n > 0 THEN
        |  (v[CAST(((n - 1) * 5) // 10 AS INTEGER) + 1] * (10 - ((n - 1) * 5) % 10)
        |   + v[CAST(least(((n - 1) * 5) // 10 + 2, n) AS INTEGER)]
        |     * (((n - 1) * 5) % 10)) / 10.0 END AS p50_us,
        |  CASE WHEN n > 0 THEN
        |  (v[CAST(((n - 1) * 9) // 10 AS INTEGER) + 1] * (10 - ((n - 1) * 9) % 10)
        |   + v[CAST(least(((n - 1) * 9) // 10 + 2, n) AS INTEGER)]
        |     * (((n - 1) * 9) % 10)) / 10.0 END AS p90_us,
        |  max_us
        |FROM a""".stripMargin,

    "q_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |coh AS (
        |  SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id)
        |SELECT cohort_day,
        |  CAST(sum(CASE WHEN a.day - cohort_day = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_day0,
        |  CAST(sum(CASE WHEN a.day - cohort_day = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_day1,
        |  CAST(sum(CASE WHEN a.day - cohort_day = 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_day7
        |FROM act a JOIN coh ON a.user_id = coh.user_id
        |GROUP BY cohort_day ORDER BY cohort_day""".stripMargin,

    "q_rate_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, day, n,
        |    count(n) OVER f AS base_days,
        |    sum(n) OVER f AS sm,
        |    sum(n * n) OVER f AS sq
        |  FROM daily
        |  WINDOW f AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT event_type, day, n, base_days,
        |    CAST(sm AS DOUBLE) / base_days AS mean,
        |    (CAST(sq AS DOUBLE) - CAST(sm AS DOUBLE) * sm / base_days)
        |      / (base_days - 1) AS v
        |  FROM w)
        |SELECT event_type, day, n, base_days,
        |  round(mean, 4) AS mean7,
        |  round(CASE WHEN base_days >= 3 AND v > 0
        |        THEN (n - mean) / sqrt(v) END, 4) AS z,
        |  (CASE WHEN base_days >= 3 AND v > 0 AND abs((n - mean) / sqrt(v)) > 2
        |        THEN 1 ELSE 0 END)::BIGINT AS anomaly
        |FROM z ORDER BY event_type, day""".stripMargin,

    "q_unpivot" ->
      s"""WITH w AS (
         |  SELECT l_returnflag,
         |    ${sumFixedSql("CAST(l_extendedprice AS DECIMAL(18,2))", 2)} AS price_e2,
         |    ${sumFixedSql("CAST(l_discount AS DECIMAL(4,2))", 2)} AS discount_e2,
         |    ${sumFixedSql("CAST(l_tax AS DECIMAL(4,2))", 2)} AS tax_e2
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, 'extendedprice' AS measure, price_e2 AS value_e2 FROM w
         |UNION ALL
         |SELECT l_returnflag, 'discount', discount_e2 FROM w
         |UNION ALL
         |SELECT l_returnflag, 'tax', tax_e2 FROM w
         |ORDER BY l_returnflag, measure""".stripMargin,

    "q_topk_agg" ->
      """SELECT event_type,
        |  array_to_string((list(CAST(CAST(value AS DECIMAL(18,2)) * 100
        |    AS BIGINT) ORDER BY CAST(CAST(value AS DECIMAL(18,2)) * 100
        |    AS BIGINT) DESC))[1:5], ',') AS top5_e2
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_ewma" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, max(day) AS maxday FROM daily GROUP BY 1),
        |t AS (
        |  SELECT d.event_type, d.cnt, m.maxday - d.day AS age,
        |         round(d.cnt * pow(0.9, m.maxday - d.day), 9) AS term9
        |  FROM daily d JOIN m USING (event_type)
        |  WHERE m.maxday - d.day <= 30)
        |SELECT event_type, count(*) AS n_days,
        |  CAST(sum(cnt) AS BIGINT) AS n_events,
        |  round(CAST(sum(CAST(term9 * 1e9 AS DECIMAL(38,0))) AS BIGINT)
        |        / 1e9, 4) AS ewma
        |FROM t GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_percentile" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
        |  round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
        |  round(quantile_cont(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_ts_similarity" ->
      """WITH d AS (
        |  SELECT user_id,
        |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT min(day) AS d0, max(day) AS d1 FROM d),
        |days AS (SELECT unnest(generate_series(d0, d1)) AS day FROM b),
        |users AS (SELECT DISTINCT user_id FROM d),
        |grid AS (
        |  SELECT u.user_id, dy.day, coalesce(d.cnt, 0) AS cnt
        |  FROM users u CROSS JOIN days dy
        |  LEFT JOIN d ON d.user_id = u.user_id AND d.day = dy.day),
        |vec AS (
        |  SELECT user_id, list(CAST(cnt AS DOUBLE) ORDER BY day) AS v,
        |         count(*) AS n, sum(cnt) AS sx, sum(cnt*cnt) AS sxx
        |  FROM grid GROUP BY 1),
        |p AS (
        |  SELECT a.user_id AS user_a, b.user_id AS user_b, a.n AS n,
        |         CAST(list_dot_product(a.v, b.v) AS BIGINT) AS sxy,
        |         a.sx AS sxa, b.sx AS sxb, a.sxx AS sxxa, b.sxx AS sxxb
        |  FROM vec a JOIN vec b ON a.user_id < b.user_id),
        |c AS (
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
        |FROM c
        |ORDER BY round(CAST(num AS DOUBLE)
        |  / (sqrt(CAST(dena AS DOUBLE)) * sqrt(CAST(denb AS DOUBLE))), 9) DESC,
        |  user_a, user_b
        |LIMIT 10""".stripMargin,

    "q_cms_freq" ->
      (Cms.estimateSql("events", "user_id") + "\nORDER BY user_id"),

    "q_cms_merge" ->
      (Cms.estimateOnlySql("events", "user_id") + "\nORDER BY user_id"),

    "q_hll_distinct" ->
      Hll.distinctEstimateSql("orders", "o_custkey", m = 64),

    "q_hll_overlap" ->
      Hll.overlapEstimateSql("orders",
        aExpr = "o_orderpriority = '1-URGENT'",
        bExpr = "o_orderpriority = '5-LOW'",
        keyExpr = "o_custkey", m = 64),

    // Deliberately the FULL-TABLE sketch: sketch-then-merge over a
    // disjoint split must reproduce it exactly.
    "q_hll_merge" ->
      Hll.distinctEstimateSql("orders", "o_custkey", m = 64),

    "q_hll_grouped" ->
      (Hll.groupedDistinctEstimateSql("orders", "o_orderpriority",
        "o_custkey", m = 64) + "\nORDER BY grp"),

    "q_hll_sets" ->
      (Hll.groupedDistinctEstimateSql(
        """(SELECT unnest([
          |    'all',
          |    'type:' || event_type,
          |    'day:' || strftime(CAST(ts AS DATE), '%Y-%m-%d'),
          |    'day_type:' || strftime(CAST(ts AS DATE), '%Y-%m-%d') ||
          |      ':' || event_type]) AS scope,
          |  user_id FROM events) sc""".stripMargin,
        "scope", "user_id", m = 64) + "\nORDER BY grp"),

    "q_hll_windowed" ->
      (Hll.groupedDistinctEstimateSql("events", "CAST(ts AS DATE)",
        "user_id", m = 64) + "\nORDER BY grp"),

    // Deliberately the FULL-TABLE histogram: digest-merge identity.
    "q_percentile_hist_merged" ->
      (Percentile.histogramPercentileSql("orders", "o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
        widthE = 1000L, ps = Seq(0.5, 0.9, 0.99)) + "\nORDER BY grp"),

    "q_cms_heavy" ->
      """SELECT l_partkey, count(*) AS n_items
        |FROM lineitem GROUP BY l_partkey
        |HAVING count(*) >= 45
        |ORDER BY n_items DESC, l_partkey""".stripMargin,

    // exact output through the bounded Misra-Gries candidate stage —
    // same ground truth as q_cms_heavy
    "q_cms_heavy_mg" ->
      """SELECT l_partkey, count(*) AS n_items
        |FROM lineitem GROUP BY l_partkey
        |HAVING count(*) >= 45
        |ORDER BY n_items DESC, l_partkey""".stripMargin,

    "q_markov" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS next_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type, next_type, count(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT from_type, sum(n) AS row_n FROM t GROUP BY 1)
        |SELECT t.from_type, t.next_type, t.n,
        |  round(CAST(t.n AS DOUBLE) / r.row_n, 4) AS p
        |FROM t JOIN r USING (from_type)
        |ORDER BY from_type, next_type""".stripMargin,

    "q_join_estimate" ->
      s"""SELECT 'orders_lineitem' AS pair, n_exact, n_est FROM
         |${Cms.joinSizeSql("orders", "o_orderkey", "lineitem", "l_orderkey")}
         |UNION ALL
         |SELECT 'customer_orders', n_exact, n_est FROM
         |${Cms.joinSizeSql("customer", "c_custkey", "orders", "o_custkey")}
         |ORDER BY pair""".stripMargin,

    "q_ts_similarity_lsh" ->
      (SeriesLsh.correlatedPairsSql(
        """  SELECT user_id,
          |         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
          |         count(*) AS cnt
          |  FROM events GROUP BY 1, 2""".stripMargin,
        threshold = 0.5, nBits = 30, bitsPerBand = 6) +
        "\nORDER BY corr DESC, user_a, user_b"),

    "q_percentile_hist" ->
      (Percentile.histogramPercentileSql("orders", "o_orderpriority",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)",
        widthE = 1000L, ps = Seq(0.5, 0.9, 0.99)) + "\nORDER BY grp"),

    "q_trimmed_mean_hist" ->
      // Deliberately the PLAIN exact windowed trimmed mean: the
      // histogram reshape must reproduce it bit-for-bit.
      """WITH j AS (
        |  SELECT c_mktsegment AS grp, o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY grp
        |                       ORDER BY cents, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY grp) AS cnt
        |  FROM j)
        |SELECT grp, count(*) AS n_kept,
        |       round(CAST(sum(cents) AS DOUBLE) / count(*) / 100.0, 4)
        |         AS trimmed_mean
        |FROM r
        |WHERE rn > cnt // 10 AND rn <= cnt - cnt // 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_mad_hist" ->
      (Percentile.histogramMadSql(
        """(SELECT c_mktsegment AS segment,
          |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
          |  FROM orders JOIN customer ON o_custkey = c_custkey) t""".stripMargin,
        "segment", "cents", widthE = 1000L) + "\nORDER BY grp"),

    "q_mad" ->
      """WITH base AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |med AS (
        |  SELECT segment, quantile_cont(cents, 0.5) AS med
        |  FROM base GROUP BY 1)
        |SELECT b.segment, count(*) AS n_orders,
        |  round(any_value(m.med), 4) AS median_cents,
        |  round(quantile_cont(abs(CAST(b.cents AS DOUBLE) - m.med), 0.5), 4)
        |    AS mad_cents
        |FROM base b JOIN med m USING (segment)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_table_profile" -> tableProfileSql,

    // same integer moment sums and sign-split half-away e6 ladder
    "q_ols_trend" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS x,
        |         count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |sums AS (
        |  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |         sum(CAST(x AS HUGEINT) * x) AS sxx,
        |         sum(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM daily GROUP BY 1),
        |d AS (
        |  SELECT event_type, n,
        |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
        |         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS snum,
        |         CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS inum
        |  FROM sums)
        |SELECT event_type, n AS n_days,
        |  CAST(CASE WHEN snum >= 0 THEN (2000000 * snum + den) // (2 * den)
        |       ELSE -((2000000 * (-snum) + den) // (2 * den)) END
        |    AS BIGINT) AS slope_e6,
        |  CAST(CASE WHEN inum >= 0 THEN (2000000 * inum + den) // (2 * den)
        |       ELSE -((2000000 * (-inum) + den) // (2 * den)) END
        |    AS BIGINT) AS intercept_e6
        |FROM d WHERE den > 0 ORDER BY event_type""".stripMargin,

    "q_stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_quantity), 4) + 0.0 AS sd_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qty_price,
        |  round(covar_samp(l_discount, l_tax), 4) + 0.0 AS cov_disc_tax,
        |  round(avg(l_extendedprice), 4) + 0.0 AS avg_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_array_agg" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS orderkeys
        |FROM orders WHERE o_totalprice > 400000
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_pivot" ->
      """SELECT epoch_us(date_trunc('day', ts)) AS day_us,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day_us""".stripMargin,

    "q_setops" ->
      """WITH h1 AS (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-07-01'),
        |h2 AS (
        |  SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT 'both' AS segment,
        |       (SELECT count(*) FROM (SELECT * FROM h1 INTERSECT SELECT * FROM h2) t) AS n_custs
        |UNION ALL
        |SELECT 'h1_only',
        |       (SELECT count(*) FROM (SELECT * FROM h1 EXCEPT SELECT * FROM h2) t)
        |UNION ALL
        |SELECT 'h2_only',
        |       (SELECT count(*) FROM (SELECT * FROM h2 EXCEPT SELECT * FROM h1) t)
        |ORDER BY segment""".stripMargin,

    "q_window_funcs" ->
      """SELECT o_custkey, o_orderkey,
        |  epoch_us(o_orderdate) AS order_ts_us,
        |  lead(o_orderkey, 1) OVER w AS next_orderkey,
        |  lag(o_orderkey, 1) OVER w AS prev_orderkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  round(cume_dist() OVER w, 4) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_range_join" ->
      """SELECT p.event_id AS purchase_seq, p.user_id,
        |       epoch_us(p.ts) AS ts_us,
        |       (SELECT count(*) FROM events c
        |        WHERE c.event_type = 'click' AND c.user_id = p.user_id
        |          AND epoch_us(c.ts) > epoch_us(p.ts) - 3600000000
        |          AND (epoch_us(c.ts) < epoch_us(p.ts)
        |               OR (epoch_us(c.ts) = epoch_us(p.ts)
        |                   AND c.event_id < p.event_id))) AS n_matches
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY purchase_seq""".stripMargin,

    // Oracle mirrors AsOf.joinPrior's exact tie rule — order by
    // (epoch-us ts, event_id) over the unioned stream, running
    // last-non-null click — instead of DuckDB's native ASOF join, which
    // compares nanosecond ts with no seq tiebreak and can diverge when
    // events collide within a microsecond.
    "q_asof_join" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id AS seq, value,
        |         1 AS is_left, NULL::BIGINT AS c_seq, NULL::BIGINT AS c_ts_us
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), event_id, NULL,
        |         0, event_id, epoch_us(ts)
        |  FROM events WHERE event_type = 'click'),
        |f AS (
        |  SELECT *,
        |    last_value(c_seq IGNORE NULLS) OVER w AS click_seq,
        |    last_value(c_ts_us IGNORE NULLS) OVER w AS click_ts_us
        |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, seq
        |                      ROWS UNBOUNDED PRECEDING))
        |SELECT seq AS purchase_seq, user_id, ts_us AS purchase_ts_us, value,
        |       click_seq, click_ts_us
        |FROM f WHERE is_left = 1 ORDER BY purchase_seq""".stripMargin,

    "q_asof_nearest" ->
      """WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id AS seq,
        |         1 AS is_left, NULL::BIGINT AS c_seq, NULL::BIGINT AS c_ts
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), event_id,
        |         0, event_id, epoch_us(ts)
        |  FROM events WHERE event_type = 'click'),
        |f AS (
        |  SELECT *,
        |    last_value(c_seq IGNORE NULLS) OVER wp AS p_seq,
        |    last_value(c_ts IGNORE NULLS) OVER wp AS p_ts,
        |    first_value(c_seq IGNORE NULLS) OVER wn AS n_seq,
        |    first_value(c_ts IGNORE NULLS) OVER wn AS n_ts
        |  FROM u WINDOW
        |    wp AS (PARTITION BY user_id ORDER BY ts_us, seq
        |           ROWS UNBOUNDED PRECEDING),
        |    wn AS (PARTITION BY user_id ORDER BY ts_us, seq
        |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
        |d AS (
        |  SELECT seq AS purchase_seq, user_id, ts_us AS purchase_ts_us,
        |    CASE
        |      WHEN p_ts IS NOT NULL
        |           AND (n_ts IS NULL OR ts_us - p_ts <= n_ts - ts_us)
        |        THEN 'prev'
        |      WHEN n_ts IS NOT NULL THEN 'next'
        |    END AS direction,
        |    p_seq, p_ts, n_seq, n_ts
        |  FROM f WHERE is_left = 1)
        |SELECT purchase_seq, user_id, purchase_ts_us,
        |  CASE direction WHEN 'prev' THEN p_seq WHEN 'next' THEN n_seq
        |  END AS click_seq,
        |  CASE direction WHEN 'prev' THEN p_ts WHEN 'next' THEN n_ts
        |  END AS click_ts_us,
        |  direction,
        |  CASE direction WHEN 'prev' THEN purchase_ts_us - p_ts
        |                 WHEN 'next' THEN n_ts - purchase_ts_us
        |  END AS dist_us
        |FROM d ORDER BY purchase_seq""".stripMargin,

    "q_trailing_spend" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |         date_diff('day', DATE '1970-01-01',
        |                   CAST(o_orderdate AS DATE))::BIGINT AS day,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, day, cents,
        |  CAST(sum(cents) OVER (
        |    PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS trailing_30d_cents
        |FROM o ORDER BY o_custkey, day, o_orderkey""".stripMargin,

    "q_trimmed_mean" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS segment, o_orderkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (
        |  SELECT *,
        |    row_number() OVER (PARTITION BY segment
        |                       ORDER BY cents, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY segment) AS cnt
        |  FROM j)
        |SELECT segment, count(*) AS n_kept,
        |       round(CAST(sum(cents) AS DOUBLE) / count(*) / 100.0, 4)
        |         AS trimmed_mean
        |FROM r
        |WHERE rn > cnt // 10 AND rn <= cnt - cnt // 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_event_paths" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT event_type || '>' || e2 || '>' || e3 AS path,
        |       count(*) AS n
        |FROM seq WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,

    "q_asof_tolerance" ->
      s"""WITH u AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, event_id AS seq, value,
        |         1 AS is_left, NULL::BIGINT AS c_seq, NULL::BIGINT AS c_ts_us
        |  FROM events WHERE event_type = 'purchase'
        |  UNION ALL
        |  SELECT user_id, epoch_us(ts), event_id, NULL,
        |         0, event_id, epoch_us(ts)
        |  FROM events WHERE event_type = 'click'),
        |f AS (
        |  SELECT *,
        |    last_value(c_seq IGNORE NULLS) OVER w AS m_seq,
        |    last_value(c_ts_us IGNORE NULLS) OVER w AS m_ts_us
        |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, seq
        |                      ROWS UNBOUNDED PRECEDING))
        |SELECT seq AS purchase_seq, user_id, ts_us AS purchase_ts_us, value,
        |  CASE WHEN m_ts_us IS NOT NULL AND ts_us - m_ts_us <= $asofToleranceUs
        |       THEN m_seq END AS click_seq,
        |  CASE WHEN m_ts_us IS NOT NULL AND ts_us - m_ts_us <= $asofToleranceUs
        |       THEN m_ts_us END AS click_ts_us
        |FROM f WHERE is_left = 1 ORDER BY purchase_seq""".stripMargin)
}
