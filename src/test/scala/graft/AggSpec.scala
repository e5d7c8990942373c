package graft

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.functions._

import graft.functions.BoundedTopK

/** BoundedTopK aggregate contracts: equals the window-rank top-k on
  * random data across many partitions (exercising partial-agg merge +
  * buffer serialization), keeps duplicate ties, and handles groups
  * smaller than k. Also callable from SQL via graft_topk. */
class AggSpec extends SparkSpec {

  private def topk(c: org.apache.spark.sql.Column, k: Int) =
    GraftSqlBridge.column(
      BoundedTopK(GraftSqlBridge.expression(c), k).toAggregateExpression())

  test("topk == sorted window top-k on random longs, many partitions") {
    import spark.implicits._
    val rows = (1 to 5000).map { i =>
      (s"g${i % 7}", ((i * 104729L) % 1000) - 500)
    }
    val df = rows.toDF("g", "v").repartition(16)
    val got = df.groupBy("g").agg(topk(col("v"), 5).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).sorted(Ordering.Long.reverse).take(5)
    }
    assert(got === want)
  }

  test("duplicate ties kept; small groups return all values") {
    import spark.implicits._
    val df = Seq(("a", 9L), ("a", 9L), ("a", 9L), ("a", 1L),
      ("b", 2L), ("b", 1L)).toDF("g", "v").repartition(4)
    val got = df.groupBy("g").agg(topk(col("v"), 3).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got("a") === Seq(9L, 9L, 9L))
    assert(got("b") === Seq(2L, 1L))
  }

  test("SQL surface: graft_topk via GraftExtensions") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq((1L, 5L), (1L, 7L), (1L, 3L)).toDF("g", "v")
      .createOrReplaceTempView("agg_t")
    val out = spark.sql(
      "SELECT graft_topk(v, 2) AS t FROM agg_t GROUP BY g")
      .collect().head.getSeq[Long](0)
    assert(out === Seq(7L, 5L))
  }
}
