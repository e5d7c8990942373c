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

  test("IVF-PQ codes artifact: a one-probe search prunes to nprobe " +
    "list directories at the scan") {
    import graft.operators.{AnnIvf, Pq}
    import graft.functions.Vectors
    import org.apache.spark.sql.functions.{broadcast, round}
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.where(col("vec_id") >= 8)
    val dir = sys.props("java.io.tmpdir") + "/graft_pushdown_ivfpq"
    Pq.encode(corpus.withColumn("__list", col("label").cast("long")),
        "vec_id", "embedding", keep = Seq("__list"))
      .write.partitionBy("__list").mode("overwrite").parquet(dir)
    val nLists = corpus.select("label").distinct().count()
    assert(nLists > 3, s"need >nprobe lists for pruning to mean anything")
    // route ONE probe to its nprobe=3 nearest lists (|lists|-row frame,
    // driver-side — this is the tiny routing a serving tier computes)
    val cent = AnnIvf.centroids(corpus, "label", "embedding")
    val lists = e.where(col("vec_id") === 0)
      .select(Vectors.toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(cent))
      .withColumn("c", Vectors.cosine(col("v"), col("centroid")))
      .orderBy(round(col("c"), 9).desc, col("label"))
      .select(col("label").cast("long")).limit(3)
      .collect().map(_.getLong(0)).toSeq
    // the literal list filter must prune at the PARTITION level — this
    // is "partition pruning does the routing's I/O at 100 TB" asserted,
    // not argued
    val scan = spark.read.parquet(dir).where(col("__list").isin(lists: _*))
    val plan = scan.queryExecution.explainString(
      ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters"))
      .mkString("\n")
    assert(pf.contains("__list"), plan.take(1200))
    // executed-plan proof: the scan touched exactly nprobe directories
    scan.collect()
    val leaf = scan.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec => f }
    assert(leaf.nonEmpty, "no file scan leaf found")
    assert(leaf.get.metrics("numPartitions").value === lists.size,
      s"scan read ${leaf.get.metrics("numPartitions").value} list dirs, " +
        s"expected ${lists.size} of $nLists")
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
