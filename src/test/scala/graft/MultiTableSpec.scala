package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.cdc._

class MultiTableSpec extends SparkSpec {

  /** Model each event_type as its own upstream table. */
  private def feeds: MultiTableChangefeed = {
    val log = Changelog.fromEvents(Tables.events(spark, sfDir))
    MultiTableChangefeed.empty
      .addTable("clicks", log.where(col("event_type") === "click"))
      .addTable("purchases", log.where(col("event_type") === "purchase"),
        Changefeed(Seq(MaskPlugin(Seq("props"), Mask.NullOut))))
  }

  test("add/remove table updates the pipeline set") {
    val f = feeds
    assert(f.tables === Set("clicks", "purchases"))
    assert(f.removeTable("clicks").tables === Set("purchases"))
    assert(f.addTable("views",
      Changelog.fromEvents(Tables.events(spark, sfDir))
        .where(col("event_type") === "view")).tables.size === 3)
  }

  test("run unions per-table chains under __table, chains apply per table") {
    val out = feeds.run()
    val byTable = out.groupBy("__table").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTable.keySet === Set("clicks", "purchases"))
    assert(byTable.values.forall(_ > 0))
    // mask plugin applied ONLY to the purchases chain
    assert(out.where(col("__table") === "purchases"
      && col("props").isNotNull).count() === 0)
    assert(out.where(col("__table") === "clicks"
      && col("props").isNull).count() === 0)
  }

  test("runTo writes one hive partition per table") {
    val path = Files.createTempDirectory("multitable").toString
    feeds.runTo(GraftSink.Files(path))
    val dirs = new java.io.File(path).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs === Set("__table=clicks", "__table=purchases"))
  }

  test("per-table resolved-ts is the min over that table's pipelines") {
    val rts = feeds.resolvedTs().collect()
      .map(r => r.getAs[String]("__table") -> r.getAs[Long]("resolved_ts_us")).toMap
    assert(rts.keySet === Set("clicks", "purchases"))
    assert(rts.values.forall(_ > 0L))
  }
}
