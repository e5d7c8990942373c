package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("AQE splits a planted skewed shuffle join (executed-plan assert)") {
    // B36's salted join is the MANUAL skew lever; the AUTOMATIC one —
    // AQE's OptimizeSkewedJoin — has been enabled since r1 but never
    // asserted. Plant a join where ~90% of the left side carries one
    // key, force a shuffle join, and pin from the EXECUTED plan that
    // the hot partition was split (numSkewedPartitions > 0), not
    // merely that the config was on. Decision boundary vs B36
    // (SURVEY §5): AQE handles skew between SMJ/SHJ partitions at
    // runtime with zero code; the salted join remains for
    // BROADCAST-side skew, for deterministic pre-planned layouts, and
    // for engines/paths where AQE's split cannot apply (stream-static
    // joins, bucketed co-located joins that must not re-shuffle).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // test-scale thresholds (production defaults are 256MB/5x; the
      // MECHANISM under assert is the same split)
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val scramble = lit(2654435761L) // keep shuffle bytes incompressible
      val left = spark.range(0, 400000).select(
        when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        (col("id") * scramble % 1000000007L).as("v"))
      val right = spark.range(0, 20000).select(
        col("id").as("k"), (col("id") * scramble % 998244353L).as("w"))
      // the tiny-collect reduction must NOT require the join's hash
      // distribution (a groupBy on the join key would make the skew
      // split cost an extra shuffle, and OptimizeSkewedJoin declines)
      val joined = left.join(right, "k").agg(count(lit(1)).as("n"))
      joined.collect() // drive THIS QueryExecution so its adaptive
                       // plan finalizes with runtime metrics
      def walk(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case o => o.children
        }
        p +: kids.flatMap(walk)
      }
      val reads = walk(joined.queryExecution.executedPlan)
        .collect { case r: AQEShuffleReadExec => r }
      val skewedParts = reads.flatMap(_.metrics.get("numSkewedPartitions"))
        .map(_.value).sum
      val skewedSplits = reads.flatMap(_.metrics.get("numSkewedSplits"))
        .map(_.value).sum
      info(s"skewed partitions: $skewedParts, splits: $skewedSplits")
      assert(skewedParts > 0,
        "AQE did not detect the planted skewed partition — " +
          walk(joined.queryExecution.executedPlan).map(_.nodeName).mkString(", "))
      assert(skewedSplits > 1,
        "AQE detected skew but did not split the hot partition")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def orders = Tables.orders(spark, sfDir)
    .select(col("o_custkey").as("c_custkey"), col("o_orderkey"))
  private def customer = Tables.customer(spark, sfDir)
    .select("c_custkey", "c_mktsegment")

  test("saltedJoin inner: row-identical to the plain join") {
    val plain = orders.join(customer, "c_custkey")
    val salted = Skew.saltedJoin(orders, customer, "c_custkey", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedJoin left: unmatched fact rows survive with nulls") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "orphan"))
      .toDF("k", "payload")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "attr")
    val got = Skew.saltedJoin(fact, dim, "k", salts = 4, joinType = "left")
    assert(got.count() === 3)
    assert(got.where(col("k") === 99 && col("attr").isNull).count() === 1)
  }

  test("keyProfile: stats match exact recompute, top-K ordered, " +
    "skewed input flagged") {
    import spark.implicits._
    // 1 viral key (500 rows) + 100 uniform keys (5 rows each)
    val rows = (0 until 500).map(_ => 7L) ++
      (1 to 100).flatMap(k => Seq.fill(5)(1000L + k))
    val df = rows.toDF("k")
    val got = Skew.keyProfile(df, "k", topK = 3).collect()
    assert(got.length === 3)
    assert(got.head.getAs[Long]("key") === 7L)
    assert(got.head.getAs[Long]("cnt") === 500L)
    assert(got.head.getAs[Long]("n_keys") === 101L)
    assert(got.head.getAs[Long]("total_rows") === 1000L)
    assert(got.head.getAs[Long]("max_cnt") === 500L)
    assert(got.head.getAs[Double]("med_cnt") === 5.0)
    // mean = 1000/101 ≈ 9.9 → skew_factor = 500/9.9 ≈ 50.5
    assert(got.head.getAs[Double]("skew_factor") > 50.0)
    assert(got.head.getAs[Double]("share") === 0.5)
    // remaining rows are uniform keys, deterministically tie-broken
    assert(got(1).getAs[Long]("cnt") === 5L)
    assert(got(1).getAs[Long]("key") === 1001L)
    assert(got(2).getAs[Long]("key") === 1002L)
  }

  test("salt actually spreads a viral key across salt values") {
    import spark.implicits._
    // one hot key with many distinct payloads (distinct rows → distinct
    // struct hashes → spread), joined against a 1-row dim
    val fact = (0 until 1000).map(i => (7L, i.toLong)).toDF("k", "payload")
    val dim = Seq((7L, "hot")).toDF("k", "attr")
    val salts = 8
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(col("k"), col("payload"))), lit(salts.toLong)))
    val used = salted.select("__salt").distinct().count()
    assert(used >= salts - 1, s"expected ~$salts salt values in use, got $used")
    // and the join still finds every row
    assert(Skew.saltedJoin(fact, dim, "k", salts).count() === 1000)
  }
}
