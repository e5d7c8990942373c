package graft

import org.apache.spark.sql.functions._

import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("chunk: windows tile every token; overlap stride covers each token twice") {
    val nonOverlap = Chunking.chunk(docs, "doc_id", "text", 16, 16).cache()
    // non-overlapping windows partition the token stream exactly
    val perDoc = nonOverlap.groupBy("doc_id").agg(sum("n_tokens").as("chunk_toks"))
    val truth = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("doc_toks"))
    assert(perDoc.join(truth, "doc_id")
      .where(col("chunk_toks") =!= col("doc_toks")).count() === 0)
    // every chunk except a doc's tail is exactly the window size
    val maxIdx = nonOverlap.groupBy("doc_id").agg(max("chunk_idx").as("last"))
    val short = nonOverlap.join(maxIdx, "doc_id")
      .where(col("chunk_idx") < col("last") && col("n_tokens") =!= 16)
    assert(short.count() === 0)
  }

  test("chunk: stride < window produces overlapping windows with correct starts") {
    val ov = Chunking.chunk(docs, "doc_id", "text", 16, 8)
    // a doc with T tokens yields ceil(T/8) windows
    val counts = ov.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
    val expected = docs.select(col("doc_id"),
      ceil(size(split(col("text"), " ")) / lit(8.0)).cast("long").as("want"))
    assert(counts.join(expected, "doc_id")
      .where(col("n_chunks") =!= col("want")).count() === 0)
  }

  test("dedupChunks: keeper is first occurrence; dup digests all share a keeper") {
    val d = Chunking.dedupChunks(docs, "doc_id", "text", 16, 16).cache()
    // exactly one non-dup (the keeper) per digest
    val keepers = d.where(!col("is_dup")).groupBy("digest")
      .agg(count(lit(1)).as("n"))
    assert(keepers.where(col("n") =!= 1).count() === 0)
    // the keeper is the min (doc_id, chunk_idx) of its digest group
    val firsts = d.groupBy("digest")
      .agg(min(struct(col("doc_id"), col("chunk_idx"))).as("first"))
    val wrong = d.where(!col("is_dup")).join(firsts, "digest")
      .where(col("doc_id") =!= col("first.doc_id") ||
        col("chunk_idx") =!= col("first.chunk_idx"))
    assert(wrong.count() === 0)
  }

  test("dedupChunks: planted cross-document boilerplate is flagged") {
    import spark.implicits._
    val boiler = "b " * 15 + "b" // 16 identical tokens
    val planted = Seq(
      (1L, boiler + " unique one two three four five six seven eight " +
        "nine ten eleven twelve thirteen fourteen fifteen"),
      (2L, boiler + " other alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa lambda mu nu xi omicron"))
      .toDF("doc_id", "text")
    val d = Chunking.dedupChunks(planted, "doc_id", "text", 16, 16)
    // doc 2's first window duplicates doc 1's first window
    assert(d.where(col("doc_id") === 2 && col("chunk_idx") === 0 &&
      col("is_dup")).count() === 1)
    assert(d.where(col("doc_id") === 1 && col("is_dup")).count() === 0)
  }
}
