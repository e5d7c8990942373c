package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.GenDocsSource

/** Documents-generator contracts: deterministic corpus with the planted
  * 25% duplicate structure, full distinctness of bases (no accidental
  * content collisions), and stream ≡ batch. */
class GenDocsSpec extends SparkSpec {

  private val fmt = "graft.sources.GenDocsSource"

  test("batch read: row function, planted dups, no accidental collisions") {
    val df = spark.read.format(fmt)
      .option("docs", 1000).option("slices", 8).load()
    assert(df.count() === 1000L)
    val byId = df.where(col("doc_id").isin(0L, 3L, 4L, 7L))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // every 4th doc is an exact copy of its group leader
    assert(byId(3L) === byId(0L))
    assert(byId(7L) === byId(4L))
    assert(byId(0L) !== byId(4L))
    assert(byId(0L) === GenDocsSource.text(0L))
    // 750 bases → 750 distinct contents: the base-64-digit prefix keeps
    // every base's text distinct (no saturation at scale)
    assert(df.select("text").distinct().count() === 750L)
    // source comes from doc_id, not base — duplicates cross sources
    assert(df.select("source").distinct().count() === 20L)
    assert(df.where(col("doc_id") === 3L).select("source")
      .first().getString(0) === "src3")
    // deterministic re-read
    val again = spark.read.format(fmt)
      .option("docs", 1000).option("slices", 8).load()
    assert(df.exceptAll(again).count() === 0L)
  }

  test("slices become even input partitions, no shuffle") {
    val df = spark.read.format(fmt)
      .option("docs", 100).option("slices", 5).load()
    assert(df.rdd.getNumPartitions === 5)
    val sizes = df.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.toSeq === Seq(20, 20, 20, 20, 20))
  }

  test("Trigger.AvailableNow drains the WHOLE range in multiple batches") {
    // Without SupportsTriggerAvailableNow the engine freezes
    // availability at the first poll (one batch) and silently truncates
    // the feed to docsPerBatch rows — this pins the multi-batch
    // drain-then-terminate contract that CrawlIngest (AvailableNow)
    // relies on.
    val q = spark.readStream.format(fmt)
      .option("docs", 500).option("docsPerBatch", 64).load()
      .writeStream.format("memory").queryName("gen_docs_avail")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination(60000) finally q.stop()
    assert(spark.table("gen_docs_avail").count() === 500L)
  }

  test("micro-batch stream drains to exactly the batch relation") {
    val q = spark.readStream.format(fmt)
      .option("docs", 500).option("docsPerBatch", 64).load()
      .writeStream.format("memory").queryName("gen_docs_stream")
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("gen_docs_stream")
    val batch = spark.read.format(fmt).option("docs", 500).load()
    assert(streamed.count() === 500L)
    assert(streamed.exceptAll(batch).count() === 0L)
    assert(batch.exceptAll(streamed).count() === 0L)
  }
}
