package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.col

import graft.queries.Analytics

/** Scan-shape contracts: predicates reach the parquet scan as
  * PushedFilters and projections prune ReadSchema — the two properties
  * that decide whether a 100 TB scan reads terabytes or petabytes. A
  * plan change that silently drops pushdown fails here, in-round. */
class PushdownSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df: DataFrame = Analytics.queries(name)(spark, sfDir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q6: range predicates are pushed into the lineitem scan") {
    val plan = planOf("q6_revenue_filter")
    assert(plan.contains("PushedFilters"), "no pushed-filter section")
    val pushed = plan.linesIterator
      .filter(_.contains("PushedFilters")).mkString("\n")
    // shipdate range + discount band + quantity cap all reach the scan
    assert(pushed.contains("l_shipdate"), pushed)
    assert(pushed.contains("l_discount"), pushed)
    assert(pushed.contains("l_quantity"), pushed)
    assert(pushed.contains("GreaterThanOrEqual") || pushed.contains("GreaterThan"), pushed)
  }

  test("q6: ReadSchema prunes to the referenced columns only") {
    val plan = planOf("q6_revenue_filter")
    val read = plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    assert(read.nonEmpty, "no ReadSchema section")
    // needed columns present…
    Seq("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
      .foreach(c => assert(read.contains(c), s"$c missing: $read"))
    // …and the fat unused ones pruned
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
      .foreach(c => assert(!read.contains(c), s"$c not pruned: $read"))
  }

  test("topic replay: partition predicate prunes directories, offset pushes") {
    import graft.cdc.{Changelog, GraftSink}
    val path = sys.props("java.io.tmpdir") + "/graft_pushdown_topic"
    GraftSink.Topic(path = path, numPartitions = 4)
      .write(Changelog.fromEvents(Tables.events(spark, sfDir)))
    val df = spark.read.parquet(path)
      .where(col("__partition") === 2 && col("__offset") >= 5)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("__partition"), plan.take(800))
    val pushed = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    assert(pushed.contains("__offset"), pushed)
  }

  test("q1: aggregate scan prunes join keys and runs whole-stage codegen") {
    val plan = planOf("q1_pricing_summary")
    val read = plan.linesIterator
      .filter(_.contains("ReadSchema")).mkString("\n")
    Seq("l_orderkey", "l_partkey", "l_suppkey")
      .foreach(c => assert(!read.contains(c), s"$c not pruned: $read"))
    // AQE finalizes stages only at execution — run the query, then the
    // executed plan must carry WholeStageCodegen spans
    val df = Analytics.queries("q1_pricing_summary")(spark, sfDir)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    // codegen'd operators print with the `*(stageId)` prefix
    assert(executed.contains("*("), executed.take(400))
  }
}
