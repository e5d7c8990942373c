package graft

import org.apache.spark.sql.functions._

/** Bucketing = the co-located-join technique for repeated fact-fact
  * joins at scale: both tables pre-hash-partitioned AND sorted on the
  * join key at write time, so the join plans with ZERO exchanges — at
  * 100 TB that's the difference between re-shuffling both fact tables
  * on every run and a scan-local merge. */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    val n = 8
    Tables.orders(spark, sfDir)
      .write.mode("overwrite")
      .bucketBy(n, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_bkt")
    Tables.lineitem(spark, sfDir)
      .write.mode("overwrite")
      .bucketBy(n, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_bkt")
    try {
      val joined = spark.table("lineitem_bkt")
        .join(spark.table("orders_bkt"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
        || plan.contains("BroadcastHashJoin"))
      val joinSection = plan.split("HashAggregate").last
      assert(!joinSection.contains("Exchange hashpartitioning(l_orderkey")
        && !joinSection.contains("Exchange hashpartitioning(o_orderkey"),
        s"join re-shuffled a bucketed side:\n$plan")
      // and the result is right
      val viaBuckets = joined.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val direct = Tables.lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(viaBuckets === direct)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
    }
  }
}
