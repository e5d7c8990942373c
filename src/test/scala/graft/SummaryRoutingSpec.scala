package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.plans.SummaryRouting

/** Contracts of the B68 summary-routing optimizer rule: a covered
  * aggregate is served from the summary artifact (the executed plan
  * must not touch the base files) with results identical to the base
  * scan; every uncovered shape must REFUSE to route — wrong-but-fast
  * is the failure mode a routing rule has to prove it doesn't have. */
class SummaryRoutingSpec extends SparkSpec {

  private lazy val baseDir = {
    val d = Files.createTempDirectory("sr_base").toString
    import spark.implicits._
    // (k1, k2, v): 60 rows, 3×2 key grid
    (0 until 60).map(i => (s"k${i % 3}", i % 2, i.toLong))
      .toDF("k1", "k2", "v")
      .write.mode("overwrite").parquet(d)
    d
  }

  private lazy val summaryDir = {
    val d = Files.createTempDirectory("sr_sum").toString
    spark.read.parquet(baseDir)
      .groupBy("k1", "k2")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .write.mode("overwrite").parquet(d)
    d
  }

  private def registered(): Unit =
    SummaryRouting.register(spark, SummaryRouting.Route(
      baseDir = baseDir, summaryDir = summaryDir,
      keys = Map("k1" -> "k1", "k2" -> "k2"),
      aggs = Map(("count", "*") -> "cnt", ("sum", "v") -> "sum_v",
        ("min", "v") -> "min_v", ("max", "v") -> "max_v")))

  private def scanPaths(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString("\n")

  test("covered aggregate is served from the summary, identically") {
    registered()
    val agg = spark.read.parquet(baseDir)
      .groupBy("k1")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .orderBy("k1")
    val plan = scanPaths(agg)
    assert(plan.contains(SummaryRouting.norm(summaryDir).stripPrefix("/")),
      s"expected a summary scan in:\n$plan")
    assert(!plan.contains(SummaryRouting.norm(baseDir).stripPrefix("/")),
      s"base scan survived routing:\n$plan")
    // identical rows AND schema vs the unrouted plan (distinct agg
    // below is never routed, so re-derive via a fresh unregistered key)
    val want = Seq(("k0", 20L, 570L, 0L, 57L), ("k1", 20L, 590L, 1L, 58L),
      ("k2", 20L, 610L, 2L, 59L))
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))).toSeq === want)
    assert(agg.schema.map(f => (f.name, f.dataType.simpleString)) ===
      Seq("k1" -> "string", "n" -> "bigint", "s" -> "bigint",
        "lo" -> "bigint", "hi" -> "bigint"))
  }

  test("full-key grouping routes too (subset includes the whole set)") {
    registered()
    val agg = spark.read.parquet(baseDir)
      .groupBy("k1", "k2").agg(count(lit(1)).as("n"))
    assert(scanPaths(agg)
      .contains(SummaryRouting.norm(summaryDir).stripPrefix("/")))
    assert(agg.agg(sum(col("n"))).collect().head.getLong(0) === 60L)
  }

  test("summary rebuild under a live route does not read itself") {
    // the q_summary_route query fn registers a route and REBUILDS the
    // summary on every invocation; without the deregister-first refresh
    // window, invocation 2's summary-building aggregate is itself a
    // covered shape and reads the artifact it just deleted
    val q = graft.queries.Analytics.queries("q_summary_route")
    val first = q(spark, sfDir).collect()
    val second = q(spark, sfDir).collect()
    assert(first.toSeq === second.toSeq)
    assert(first.nonEmpty)
  }

  test("uncovered shapes refuse to route (base scan answers)") {
    registered()
    def readsBase(df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = scanPaths(df)
      assert(plan.contains(SummaryRouting.norm(baseDir).stripPrefix("/")),
        s"expected the base scan in:\n$plan")
    }
    val base = spark.read.parquet(baseDir)
    // a filter between aggregate and scan
    readsBase(base.where(col("v") > 10).groupBy("k1")
      .agg(count(lit(1)).as("n")))
    // grouping by a non-key column
    readsBase(base.groupBy("v").agg(count(lit(1)).as("n")))
    // an aggregate the summary has no partial for
    readsBase(base.groupBy("k1").agg(avg(col("v")).as("a")))
    // distinct aggregate
    readsBase(base.groupBy("k1").agg(countDistinct(col("v")).as("d")))
    // computed grouping expression
    readsBase(base.groupBy(upper(col("k1")).as("u"))
      .agg(count(lit(1)).as("n")))
  }
}
