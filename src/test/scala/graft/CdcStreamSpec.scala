package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.cdc._
import graft.streaming.CdcStream

class CdcStreamSpec extends SparkSpec {

  private def batchEvents: DataFrame = Tables.events(spark, sfDir)

  /** Write the events table as `n` ts-ordered parquet files into a fresh
    * dir (sequential writes → mtime order == event-time order), so the
    * file stream sees n ordered "flushes". */
  private def sliceIntoDir(n: Int): (String, DataFrame) = {
    val dir = Files.createTempDirectory("stream-in").toString
    val ev = batchEvents
    val total = ev.count()
    val ranked = ev.withColumn("__rn",
      row_number().over(Window.orderBy(col("ts_us"), col("event_id"))))
    for (i <- 0 until n) {
      val lo = i * total / n + 1
      val hi = (i + 1) * total / n
      val staging = Files.createTempDirectory(s"slice-$i")
      ranked.where(col("__rn").between(lo, hi)).drop("__rn")
        .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging.toString)
      val part = Files.list(staging).filter(_.toString.endsWith(".parquet"))
        .findFirst().get()
      Files.move(part, Paths.get(dir, f"flush-$i%03d.parquet"),
        StandardCopyOption.ATOMIC_MOVE)
      Thread.sleep(5) // distinct mtimes
    }
    (dir, ev)
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("streamed plugin chain output equals the batch chain output") {
    val (inDir, ev) = sliceIntoDir(4)
    val chain = Changefeed(Seq(
      TransformPlugin("to-changelog", Changelog.fromEvents),
      EventTypeFilter(Set("purchase", "click")),
      MaskPlugin(Seq("props"), Mask.RedactKeepLast(2))))
    val outDir = tmp("stream-out")
    val stream = CdcStream.fromParquetDir(spark, inDir, ev.schema)
    val q = CdcStream.deliver(stream, chain,
      GraftSink.Files(outDir, saveMode = SaveMode.Append), tmp("ckpt"))
    q.awaitTermination()
    val streamed = spark.read.schema(
      chain.run(ev).schema).parquet(outDir)
    val batch = chain.run(ev)
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("snapshot of the streamed feed equals the batch snapshot (A2 parity)") {
    val (inDir, ev) = sliceIntoDir(3)
    val chain = Changefeed(Seq(TransformPlugin("to-changelog", Changelog.fromEvents)))
    val outDir = tmp("stream-snap")
    val q = CdcStream.deliver(
      CdcStream.fromParquetDir(spark, inDir, ev.schema), chain,
      GraftSink.Files(outDir, saveMode = SaveMode.Append), tmp("ckpt"))
    q.awaitTermination()
    val streamedSnap = Materialize.snapshot(spark.read.parquet(outDir))
    val batchSnap = Materialize.snapshot(Changelog.fromEvents(ev))
    assert(streamedSnap.exceptAll(batchSnap).count() === 0)
    assert(batchSnap.exceptAll(streamedSnap).count() === 0)
  }

  test("stateful snapshot stream converges to the batch snapshot (A2 streaming form)") {
    val (inDir, ev) = sliceIntoDir(3)
    val stream = CdcStream.fromParquetDir(spark, inDir, ev.schema)
    val updates = CdcStream.snapshotUpdates(
      Changelog.fromEvents(stream))
    val q = updates.toDF().writeStream
      .format("memory").queryName("snap_updates").outputMode("update")
      .option("checkpointLocation", tmp("ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // final state per key = latest emitted update; drop tombstones
    val streamedSnap = Materialize.snapshot(spark.table("snap_updates"))
    val batchSnap = Materialize.snapshot(Changelog.fromEvents(ev))
    assert(streamedSnap.exceptAll(batchSnap).count() === 0)
    assert(batchSnap.exceptAll(streamedSnap).count() === 0)
  }

  test("windowed counts with watermark: emitted windows match batch; resolved-ts advances") {
    val (inDir, ev) = sliceIntoDir(4)
    val counts = CdcStream.windowedCounts(
      CdcStream.fromParquetDir(spark, inDir, ev.schema),
      tsCol = "ts", windowLen = "1 hour", watermarkDelay = "30 minutes")
    val q = counts.writeStream
      .format("memory").queryName("win_counts").outputMode("append")
      .option("checkpointLocation", tmp("ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(CdcStream.resolvedTsUs(q).exists(_ > 0L))
    val emitted = spark.table("win_counts")
    val batch = ev.groupBy(
      unix_micros(date_trunc("hour", col("ts"))).as("window_start_us"),
      col("event_type")).agg(count(lit(1)).as("n_events"))
    // append mode: every emitted (finalized) window must exactly match
    // the batch result; the un-finalized tail may be withheld
    assert(emitted.count() > 0)
    assert(emitted.exceptAll(batch).count() === 0)
    // most of the timeline is below the final watermark => nearly all
    // windows must have been emitted
    assert(emitted.count() >= batch.count() / 2,
      s"only ${emitted.count()} of ${batch.count()} windows emitted")
  }
}
