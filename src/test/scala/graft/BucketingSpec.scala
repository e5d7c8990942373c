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

  test("incremental dedup against a bucketed digest table never " +
    "re-shuffles the corpus side (C25's promised co-location)") {
    val docs = Tables.documents(spark, sfDir)
    // corpus = first half of the docs; daily batch = all docs (so the
    // batch holds both already-ingested and genuinely-new content)
    val corpus = docs.where(col("doc_id") % 2 === 0)
    graft.operators.Dedup.writeCorpusDigests(
      corpus, "doc_id", "text", "corpus_digests_bkt",
      buckets = spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // at test scale the corpus digest set is broadcast-small, which
    // hides the shape under test; disable broadcast to get the plan a
    // billions-of-digests corpus would get (shuffle-requiring join)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = graft.operators.Dedup.incrementalAgainstDigests(
        docs, "corpus_digests_bkt", "doc_id", "text")
      val plan = out.queryExecution.executedPlan.toString
      // exactly ONE shuffle in the whole plan — the batch side. The
      // bucketed corpus scan must plan with no Exchange above it.
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges === 1,
        s"expected only the batch-side exchange, got $exchanges:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"corpus side must be the bucketed scan:\n$plan")
      // and the result matches the unbucketed reference implementation
      val reference = graft.operators.Dedup.incremental(
        docs, corpus, "doc_id", "text")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val got = out.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === reference)
      assert(got.nonEmpty, "odd-id docs should survive the anti-join")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS corpus_digests_bkt")
    }
  }
}
