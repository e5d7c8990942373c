package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Cdc, Docs}

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

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Cdc.queries ++ Analytics.queries ++ Docs.queries

  def oracleSql: Map[String, String] =
    Cdc.oracles ++ Analytics.oracles ++ Docs.oracles
}
