package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries and flag
  * known scale-killer shapes (unpartitioned windows, cartesian products,
  * non-broadcast joins of tiny dims). Usage:
  *   sbt "runMain graft.PlanAudit [sfDir] [query ...]"
  * With no query args, audits every SparkEntry query and prints only the
  * flags summary; with query names, prints their full formatted plans. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val targets =
      if (names.nonEmpty) names else SparkEntry.queries.keys.toSeq.sorted
    var flagged = 0
    for (name <- targets) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val flags = Seq(
        "unpartitioned window" -> plan.contains("Window Partition Specification: []"),
        "cartesian product" -> plan.contains("CartesianProduct"),
        "broadcast nested loop" -> plan.contains("BroadcastNestedLoopJoin"))
        .collect { case (what, true) => what }
      if (flags.nonEmpty) flagged += 1
      println(s"== $name${if (flags.isEmpty) "" else flags.mkString("  [", ", ", "]")}")
      if (names.nonEmpty) println(plan)
    }
    println(s"== audited ${targets.size} plans, $flagged flagged")
  }
}
