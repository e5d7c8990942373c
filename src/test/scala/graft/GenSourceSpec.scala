package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.GenSource

/** DSv2 generator-source contracts: deterministic row function, even
  * slice partitioning, and batch ≡ streaming (the micro-batch stream
  * must deliver exactly the batch relation, replay-stable). */
class GenSourceSpec extends SparkSpec {

  private val fmt = "graft.sources.GenSource"

  test("batch read: row function, count, and determinism") {
    val df = spark.read.format(fmt)
      .option("rows", 1000).option("users", 7).option("slices", 8).load()
    assert(df.count() === 1000L)
    val r = df.where(col("event_id") === 123L).collect().head
    assert(r.getLong(1) === (123L * 37) % 7)
    assert(r.getLong(2) === GenSource.epochUs + 123L * GenSource.stepUs)
    assert(r.getString(3) === GenSource.eventTypes(((123L * 13) % 5).toInt))
    assert(r.getLong(4) === (123L * 7919) % 100000)
    val again = spark.read.format(fmt)
      .option("rows", 1000).option("users", 7).option("slices", 8).load()
    assert(df.exceptAll(again).count() === 0L)
    assert(again.exceptAll(df).count() === 0L)
  }

  test("slices become even input partitions, no shuffle") {
    val df = spark.read.format(fmt)
      .option("rows", 100).option("slices", 5).load()
    assert(df.rdd.getNumPartitions === 5)
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.toSeq === Seq(20, 20, 20, 20, 20))
  }

  test("GenSource stream drives the CDC plugin chain: stream ≡ batch") {
    import graft.cdc.{Changelog, EventTypeFilter, Mask, MaskPlugin}
    def toChangelog(df: org.apache.spark.sql.DataFrame) =
      Changelog.fromEvents(df
        .withColumn("value", col("value_e2") / 100.0)
        .withColumn("props", lit(null).cast("string")))
    def chain(df: org.apache.spark.sql.DataFrame) =
      MaskPlugin(Seq("key"), Mask.Sha256)(
        EventTypeFilter(Set("purchase", "click"))(toChangelog(df)))
    val opts = Map("rows" -> "400", "users" -> "13", "rowsPerBatch" -> "97")
    val q = chain(
      spark.readStream.format(fmt).options(opts).load())
      .writeStream.format("memory").queryName("gen_chain")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("gen_chain")
    val batch = chain(spark.read.format(fmt).options(opts).load())
    assert(streamed.count() === batch.count() && batch.count() > 0)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }

  test("restart from checkpoint: no duplicate delivery, no regression") {
    // Stop mid-stream, restart the SAME query from its checkpoint with
    // a FRESH stream instance: the recovered `available` mark must seed
    // from the checkpointed offset (not restart at 0, which would
    // regress latestOffset below the committed offset and re-deliver
    // committed rows). Done = union of both runs is exactly the batch
    // relation, each event_id exactly once.
    val ckpt = java.nio.file.Files
      .createTempDirectory("gen_restart_ckpt").toString
    val out = java.nio.file.Files
      .createTempDirectory("gen_restart_out").toString
    def run(): Unit = {
      // file sink: the one built-in sink that supports checkpoint
      // recovery (memory sink refuses to resume)
      val q = spark.readStream.format(fmt)
        .option("rows", 300).option("users", 11)
        .option("rowsPerBatch", 50).load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(0))
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run()   // drains all 300 rows, checkpoint at 300
    run()   // recovery on a fresh stream: must deliver ZERO new rows
    val delivered = spark.read.parquet(out)
    assert(delivered.count() === 300L,
      "restarted stream re-delivered committed rows")
    val batch = spark.read.format(fmt)
      .option("rows", 300).option("users", 11).load()
    assert(delivered.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(delivered).count() === 0L)
  }

  test("micro-batch stream drains to exactly the batch relation") {
    val q = spark.readStream.format(fmt)
      .option("rows", 500).option("users", 11)
      .option("rowsPerBatch", 64).load()
      .writeStream.format("memory").queryName("gen_stream")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("gen_stream")
    val batch = spark.read.format(fmt)
      .option("rows", 500).option("users", 11).load()
    assert(streamed.count() === 500L)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }
}
