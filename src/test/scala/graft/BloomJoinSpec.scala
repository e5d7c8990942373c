package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter semi-join reduction — the engine-side lever for
  * selective fact⋈dim joins at 100 TB: when the dim side is filtered
  * hard, Catalyst can inject a bloom filter built from the dim keys
  * into the FACT scan, discarding non-joining fact rows before the
  * shuffle. The library keeps join plans declarative precisely so this
  * optimization stays available; this spec pins that (a) the injection
  * actually fires on our join shapes once the size thresholds admit
  * local-test data, and (b) it never changes results. */
class BloomJoinSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim join injects a bloom filter on the fact side") {
    val li = Tables.lineitem(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
      .where(col("o_orderpriority") === "1-URGENT"
        && col("o_totalprice") > 200000)
    def q = li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("qty"))
      .orderBy("o_orderpriority")
    val unfiltered = q.collect()
    val (filtered, plan) = withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local-test data is far below the production 10 GB application /
      // 10 MB creation thresholds — admit it so the injection can fire
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // bloom reduction targets SHUFFLE joins (a broadcast join already
      // filters at probe time); at 100 TB this dim wouldn't broadcast,
      // so model that join shape here
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = q
      (df.collect(), df.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("might_contain"),
      s"no runtime bloom filter injected; plan:\n${plan.take(4000)}")
    assert(plan.contains("bloom_filter_agg"),
      "bloom build side missing from the plan")
    assert(filtered.toSeq === unfiltered.toSeq,
      "bloom-filtered join changed results")
  }
}
