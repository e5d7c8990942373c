package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Determinism rules (SURVEY.md §6): money aggregates cast to decimal at
  * the scan (exact + order-independent in both engines); timestamps cross
  * the engine boundary as epoch-microsecond bigints; every output has a
  * total-order tiebreak.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_snapshot")(spark, "/root/testdata/sf0.001")

  // ---- shared helpers -----------------------------------------------------

  private def dec182(c: String): Column = col(c).cast("decimal(18,2)")
  private def dec42(c: String): Column = col(c).cast("decimal(4,2)")
  private def one: Column = lit(1).cast("decimal(4,2)")

  private def changelog(s: SparkSession, dir: String): DataFrame =
    Changelog.fromEvents(Tables.events(s, dir))

  // ---- queries ------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // B1: grouped aggregation, decimal-exact (TPC-H Q1 shape)
    "q1_pricing_summary" -> ((s, dir) => {
      val disc = (dec182("l_extendedprice") * (one - dec42("l_discount")))
        .cast("decimal(18,4)")
      val charge = (disc * (one + dec42("l_tax"))).cast("decimal(18,6)")
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") < lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec182("l_quantity")).cast("decimal(38,2)").as("sum_qty"),
          sum(dec182("l_extendedprice")).cast("decimal(38,2)").as("sum_base_price"),
          sum(disc).cast("decimal(38,4)").as("sum_disc_price"),
          sum(charge).cast("decimal(38,6)").as("sum_charge"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // B2: filter + projection pushdown (TPC-H Q6 shape)
    "q6_revenue_filter" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount") >= 0.03 && col("l_discount") <= 0.07
          && col("l_quantity") < 24)
        .agg(
          sum(dec182("l_extendedprice") * dec42("l_discount"))
            .cast("decimal(38,4)").as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // A1+A2: changelog → latest-state snapshot, delete tombstones dropped
    "cdc_snapshot" -> ((s, dir) => {
      Materialize.snapshot(changelog(s, dir))
        .select(
          col("key").as("user_id"),
          col("event_type").as("last_event_type"),
          col("value").as("last_value"),
          col("commit_ts_us").as("last_ts_us"))
        .orderBy("user_id")
    }),

    // A3: resolved-ts watermark
    "cdc_resolved_ts" -> ((s, dir) => Materialize.resolvedTs(changelog(s, dir), 32)),

    // A4: plugin chain — event-type + predicate filters
    "cdc_event_filter" -> ((s, dir) => {
      Changefeed(Seq(
        EventTypeFilter(Set("purchase", "click")),
        PredicateFilter("high-value", col("value") > 100.0)))
        .run(changelog(s, dir))
        .select(col("seq"), col("key").as("user_id"), col("event_type"),
          col("value"), col("commit_ts_us"))
        .orderBy("seq")
    }),

    // A5: sensitive-field masking plugin
    "cdc_mask" -> ((s, dir) => {
      Changefeed(Seq(
        EventTypeFilter(Set("purchase")),
        TransformPlugin("project", df => df.select(
          col("seq"),
          Mask(col("key"), Mask.Sha256).as("user_hash"),
          Mask(col("props"), Mask.RedactKeepLast(2)).as("props_masked"),
          col("event_type"), col("value")))))
        .run(changelog(s, dir))
        .orderBy("seq")
    }),

    // A6: partition routing plugin (key mod N) + per-route stats
    "cdc_route" -> ((s, dir) => {
      Changefeed(Seq(RoutePlugin(Route.KeyMod, 16)))
        .run(changelog(s, dir))
        .groupBy(col("__partition"), col("op"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(dec182("value")).cast("decimal(38,2)").as("sum_value"))
        .orderBy("__partition", "op")
    }),

    // A14: exact replay-dedup (at-least-once delivery collapsed)
    "cdc_dedup" -> ((s, dir) => {
      val log = changelog(s, dir)
      Materialize.dedup(log.unionAll(log)) // simulate redelivery
        .select("key", "commit_ts_us", "seq", "op", "event_type", "value", "props")
        .orderBy("seq")
    }))

  // ---- oracle SQL (DuckDB) ------------------------------------------------

  /** The changelog derivation (SURVEY.md §3) as a DuckDB CTE. */
  private val logCte =
    """WITH log AS (
      |  SELECT user_id AS key, epoch_us(ts) AS commit_ts_us, event_id AS seq,
      |         CASE event_type WHEN 'signup' THEN 'I'
      |                         WHEN 'error' THEN 'D' ELSE 'U' END AS op,
      |         event_type, value, props
      |  FROM events)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) AS sum_disc_price,
        |  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q6_revenue_filter" ->
      """SELECT
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(38,4)) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24""".stripMargin,

    "cdc_snapshot" -> (logCte +
      """,
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY key
        |            ORDER BY commit_ts_us DESC, seq DESC) AS rn
        |  FROM log)
        |SELECT key AS user_id, event_type AS last_event_type,
        |       value AS last_value, commit_ts_us AS last_ts_us
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY user_id""".stripMargin),

    "cdc_resolved_ts" -> (logCte +
      """
        |SELECT min(max_ts_us) AS resolved_ts_us FROM (
        |  SELECT key % 32 AS pipeline, max(commit_ts_us) AS max_ts_us
        |  FROM log GROUP BY 1) t""".stripMargin),

    "cdc_event_filter" -> (logCte +
      """
        |SELECT seq, key AS user_id, event_type, value, commit_ts_us
        |FROM log
        |WHERE event_type IN ('purchase','click') AND value > 100.0
        |ORDER BY seq""".stripMargin),

    "cdc_mask" -> (logCte +
      """
        |SELECT seq, sha256(CAST(key AS VARCHAR)) AS user_hash,
        |       '****' || substr(props, -2, 2) AS props_masked,
        |       event_type, value
        |FROM log WHERE event_type = 'purchase'
        |ORDER BY seq""".stripMargin),

    "cdc_route" -> (logCte +
      """
        |SELECT key % 16 AS __partition, op,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS sum_value
        |FROM log GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin),

    "cdc_dedup" -> (logCte +
      """
        |SELECT key, commit_ts_us, seq, op, event_type, value, props
        |FROM log ORDER BY seq""".stripMargin))
}
