package graft

import org.apache.spark.sql.functions._

import graft.cdc.Consistency

class ConsistencySpec extends SparkSpec {

  import spark.implicits._

  private def table = Seq(
    (1L, "a", 100L), (2L, "b", 200L), (3L, "c", 300L), (18L, "d", 400L))
    .toDF("k", "s", "v")

  private def sum(df: org.apache.spark.sql.DataFrame) =
    Consistency.checksum(df, col("k"), Seq(col("k"), col("s"), col("v")), 4)

  test("checksum is order- and partitioning-independent") {
    val a = sum(table).collect().toSet
    val b = sum(table.orderBy(desc("k")).repartition(7)).collect().toSet
    assert(a === b)
  }

  test("checksum detects a single changed cell and localizes its bucket") {
    val changed = table.withColumn("v",
      when(col("k") === 2, 201L).otherwise(col("v")))
    val base = sum(table).as[(Long, Long, Long)].collect().toMap2
    val got = sum(changed).as[(Long, Long, Long)].collect().toMap2
    val diff = base.keySet.filter(b => base(b) != got(b))
    assert(diff.size === 1, "exactly one bucket must differ")
    // row counts still match — only the digest moved
    assert(sum(changed).agg(org.apache.spark.sql.functions.sum("n_rows"))
      .head().getLong(0) === 4)
  }

  test("a dropped row changes both n_rows and checksum of its bucket only") {
    val dropped = table.where(col("k") =!= 18)
    val base = sum(table).collect().map(r => r.getLong(0) -> r).toMap
    val got = sum(dropped).collect().map(r => r.getLong(0) -> r).toMap
    val differing = base.keySet.filter { b =>
      !got.contains(b) || got(b).getLong(2) != base(b).getLong(2) }
    assert(differing.size === 1)
  }

  private implicit class Tuples(rows: Array[(Long, Long, Long)]) {
    def toMap2: Map[Long, Long] = rows.map(r => r._1 -> r._3).toMap
  }
}
