package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crawl-frontier scheduling — the batch planner feeding the crawl
  * ingestion path (streaming/CrawlIngest.scala consumes what this
  * schedules). A polite distributed crawler must answer: of the
  * discovered-but-unfetched URLs, WHEN may each be fetched, honoring
  * per-host politeness (a minimum delay between hits to one host) and
  * per-host cycle budgets (at most B pages per host per crawl cycle —
  * the crawl-budget allocation that stops one giant host from
  * starving the frontier).
  *
  * Relational shape: already-fetched URLs anti-join out against the
  * crawl ledger (ledger-sized, broadcastable when small; at 100 TB the
  * ledger side is bucketed by url digest like the C25 dedup corpus);
  * then ONE window per host assigns each pending URL its host-local
  * rank by priority, and the fetch time is pure CASE arithmetic on
  * (rank, budget, delay) — cycle = rank / B, fetch_at = cycle·period +
  * (rank mod B)·delay. One shuffle by host, which is also the
  * partitioning a fetcher fleet wants (host-affine workers reuse
  * connections and robots.txt caches). */
object Frontier {

  /** Schedule `pending` (already ledger-filtered): per `hostCol`, rank
    * by `orderCols` (the crawl priority), then place rank r at
    * cycle = r / `budgetPerCycle`, fetch_at_s = cycle · `cyclePeriodS`
    * + (r mod budget) · `delaySecCol` (the host's politeness delay).
    * Adds `fetch_rank`, `fetch_cycle`, `fetch_at_s`. */
  def schedule(pending: DataFrame, hostCol: String, delaySecCol: String,
               orderCols: Seq[Column], budgetPerCycle: Int,
               cyclePeriodS: Long): DataFrame = {
    require(budgetPerCycle >= 1, "budget must admit at least one fetch")
    val w = Window.partitionBy(col(hostCol)).orderBy(orderCols: _*)
    pending
      .withColumn("fetch_rank", row_number().over(w).cast("long") - 1)
      .withColumn("fetch_cycle",
        floor(col("fetch_rank") / budgetPerCycle).cast("long"))
      .withColumn("fetch_at_s",
        col("fetch_cycle") * cyclePeriodS +
          pmod(col("fetch_rank"), lit(budgetPerCycle.toLong)) *
            col(delaySecCol))
  }
}
