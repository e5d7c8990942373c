package graft

import org.apache.spark.sql.functions._

import graft.cdc._
import graft.cdc.SchemaEvolution._

class SchemaEvolutionSpec extends SparkSpec {

  private def log = Changelog.fromEvents(Tables.events(spark, sfDir))

  test("evolve applies rename + add-with-default + drop in ts order") {
    val out = evolve(log, Seq(
      RenameColumn("value", "amount", commitTsUs = 1),
      AddColumn("region", lit("unknown"), commitTsUs = 2),
      DropColumn("props", commitTsUs = 3)))
    assert(out.columns.contains("amount"))
    assert(!out.columns.contains("value"))
    assert(!out.columns.contains("props"))
    assert(out.where(col("region") =!= "unknown").count() === 0)
    assert(out.count() === log.count())
  }

  test("splice merges segments with different historical schemas") {
    val oldSegment = log.drop("props").limit(100)          // pre-DDL schema
    val newSegment = log.limit(50)                          // current schema
    val spliced = splice(Seq(oldSegment, newSegment), Seq(
      AddColumn("props", lit("{}"))))
    assert(spliced.count() === 150)
    // old rows had no props -> default; new rows keep theirs
    assert(spliced.where(col("props").isNull).count() === 0)
    assert(spliced.where(col("props") === "{}").count() >= 100)
  }

  test("snapshot under evolved schema keeps latest-state semantics") {
    val evolved = evolve(log, Seq(RenameColumn("value", "amount")))
    val snapEvolved = Materialize.snapshot(evolved)
      .withColumnRenamed("amount", "value")
    val snapPlain = Materialize.snapshot(log)
      .select(snapEvolved.columns.map(col).toSeq: _*)
    assert(snapEvolved.exceptAll(snapPlain).count() === 0)
    assert(snapPlain.exceptAll(snapEvolved).count() === 0)
  }

  test("before-images carry the prior payload; inserts have none") {
    val withBefore = Changelog.withBeforeImages(log, Seq("event_type", "value"))
    assert(withBefore.where(col("op") === "I" && col("before").isNotNull).count() === 0)
    // spot-check one key's sequence: before.value == lag(value)
    val bad = withBefore
      .withColumn("expected", lag(col("value"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy("commit_ts_us", "seq")))
      .where(col("op") =!= "I" && col("before").isNotNull
        && col("before.value") =!= col("expected"))
    assert(bad.count() === 0)
  }
}
