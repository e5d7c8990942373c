package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)
  private val budget = 2048

  test("assignShards: every doc placed once, offsets are a dense token concat per bucket") {
    val packed = Packing.assignShards(docs, "doc_id", "text", 8, budget).cache()
    assert(packed.count() === docs.count())
    // within a bucket, each doc starts exactly where the previous ended
    val gaps = packed
      .withColumn("prev_end", lag(col("start_tok") + col("n_tokens"), 1, 0L)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy("bucket").orderBy("doc_id")))
      .where(col("start_tok") =!= col("prev_end"))
    assert(gaps.count() === 0)
  }

  test("assignShards: shard token sums bounded by budget + max doc tokens") {
    val packed = Packing.assignShards(docs, "doc_id", "text", 8, budget)
    val maxDoc = packed.agg(max("n_tokens")).first().getLong(0)
    val overs = packed.groupBy("bucket", "shard")
      .agg(sum("n_tokens").as("shard_tokens"))
      .where(col("shard_tokens") > budget + maxDoc)
    assert(overs.count() === 0)
    // shards actually fill up: most non-tail shards are at least half full
    val shards = packed.groupBy("bucket", "shard")
      .agg(sum("n_tokens").as("shard_tokens"),
        max(col("start_tok") + col("n_tokens")).as("end_tok"))
    val bucketEnd = packed.groupBy("bucket")
      .agg(max(col("start_tok") + col("n_tokens")).as("bucket_end"))
    val nonTail = shards.join(bucketEnd, "bucket")
      .where(col("end_tok") < col("bucket_end"))
    val underfull = nonTail.where(col("shard_tokens") < budget / 2).count()
    assert(underfull === 0,
      s"$underfull non-tail shards under half budget")
  }

  test("assignShards is deterministic and append-stable in expectation") {
    val a = Packing.assignShards(docs, "doc_id", "text", 8, budget)
    val b = Packing.assignShards(docs, "doc_id", "text", 8, budget)
    assert(a.exceptAll(b).count() === 0)
  }
}
