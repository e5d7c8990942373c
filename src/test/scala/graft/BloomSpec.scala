package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.Blooms
import graft.operators.Dedup

/** Bloom-prefiltered incremental dedup: the prefilter is a plan
  * optimization, never a semantic one — the result must be EXACTLY the
  * unfiltered anti-join's, under a well-sized sketch AND under a
  * deliberately-undersized one that forces false positives through the
  * verify branch. */
class BloomSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  private def corpusAndBatch = {
    val half = docs.agg(floor(max(col("doc_id")) / lit(2)).as("__half"))
    val corpus = docs.crossJoin(broadcast(half))
      .where(col("doc_id") <= col("__half"))
    val batch = docs.unionAll(docs.withColumn("doc_id", col("doc_id") + 1000000L))
    (corpus, batch)
  }

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("bloom-prefiltered incremental dedup equals the exact anti-join") {
    val (corpus, batch) = corpusAndBatch
    val bloom = Dedup.buildDigestBloom(corpus, "text", expectedItems = 1L << 16)
    val viaBloom = asSet(Dedup.incrementalBloom(batch, corpus, bloom, "doc_id", "text"))
    val exact = asSet(Dedup.incremental(batch, corpus, "doc_id", "text"))
    assert(viaBloom == exact)
    assert(exact.nonEmpty)
  }

  test("an undersized sketch (many false positives) still yields the exact result") {
    val (corpus, batch) = corpusAndBatch
    // expectedItems=8 for thousands of digests → fpp near 1: nearly every
    // batch digest takes the verify branch; result must not change.
    val tiny = Dedup.buildDigestBloom(corpus, "text", expectedItems = 8)
    assert(tiny.expectedFpp() > 0.5, s"fpp=${tiny.expectedFpp()} not saturated")
    val viaBloom = asSet(Dedup.incrementalBloom(batch, corpus, tiny, "doc_id", "text"))
    assert(viaBloom == asSet(Dedup.incremental(batch, corpus, "doc_id", "text")))
  }

  test("probe expression agrees with the sketch library on hits and misses") {
    val bloom = BloomFilter.create(1000, 0.01)
    (0 until 100).foreach(i => bloom.putString(s"present-$i"))
    val df = spark.range(200).select(
      concat(lit("present-"), col("id")).as("s"))
      .withColumn("hit", Blooms.mightContain(col("s"), bloom))
    val rows = df.collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    // no false negatives ever
    (0 until 100).foreach(i => assert(rows(s"present-$i")))
    // at 1% fpp over 100 absent probes, expect (with huge margin) <50 hits
    val falsePos = (100 until 200).count(i => rows(s"present-$i"))
    assert(falsePos < 50, s"$falsePos false positives — probe semantics broken?")
  }
}
