package graft

import graft.operators.Bm25

/** BM25 ranking semantics on a hand-built corpus where the right order
  * is obvious: term frequency helps, document length hurts, rare terms
  * outweigh common ones, and absent query terms contribute nothing.
  * (Cross-engine parity of the score ladder is the `doc_bm25_topk`
  * oracle's job; this spec pins the semantics.) */
class Bm25Spec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "cat cat cat"),                      // tf-heavy, short
      (2L, "cat"),                              // single hit, shortest
      (3L, "cat " + Seq.fill(50)("filler").mkString(" ")), // long doc
      (4L, "dog"),                              // rare term
      (5L, "bird bird"),                        // never queried
      (6L, "dog dog cat")                       // both terms
    ).toDF("doc_id", "text")
  }

  test("tf raises and doc length lowers the score; absent terms drop out") {
    val out = Bm25.topK(corpus, "doc_id", "text",
        Seq("q" -> "cat unseen_term"), k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    val ids = out.map(_._1)
    // Only cat-bearing docs can score; 'unseen_term' has no postings.
    assert(ids.toSet == Set(1L, 2L, 3L, 6L))
    val score = out.map(t => t._1 -> t._3).toMap
    assert(score(1L) > score(2L)) // higher tf wins at equal length
    assert(score(2L) > score(3L)) // length normalization: short beats long
    assert(out.forall(_._2 == 1L)) // exactly one query term matched each
  }

  test("rarer terms carry more idf weight") {
    val out = Bm25.topK(corpus, "doc_id", "text",
        Seq("q" -> "cat dog"), k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    val score = out.map(t => t._1 -> t._3).toMap
    // doc 6 matches both terms — must out-rank every single-term doc
    assert(score(6L) == out.map(_._3).max)
    // 'dog' (df=2) is rarer than 'cat' (df=4): doc 4 (one dog) beats
    // doc 2 (one cat) at identical length
    assert(score(4L) > score(2L))
  }

  test("k cuts the tail deterministically with doc-id tiebreak") {
    val out = Bm25.topK(corpus, "doc_id", "text",
        Seq("q" -> "cat"), k = 2)
      .collect()
    assert(out.length == 2)
    assert(out.map(_.getLong(1)).toSeq.sorted == Seq(1L, 2L))
  }

  test("rrfRerank: a strong quality prior lifts a low-relevance hit; " +
    "flat priors fuse predictably; output is deterministic") {
    import org.apache.spark.sql.functions._
    val hits = Bm25.topK(corpus, "doc_id", "text", Seq("q" -> "cat"), k = 4)
    // BM25 order is 1, 2, 6, 3; a flat prior ranks candidates by the
    // id tiebreak (1, 2, 3, 6). Docs 6 and 3 hold rank pairs (3,4) /
    // (4,3) — symmetric, so their rrf sums TIE exactly and the id
    // tiebreak puts 3 first: fused order 1, 2, 3, 6.
    val flat = corpus.select(col("doc_id"), lit(0.5).as("score"))
    val fusedFlat = Bm25.rrfRerank(hits, flat, "doc_id")
      .orderBy("fused_rank").collect()
    assert(fusedFlat.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L, 6L))
    assert(fusedFlat.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L, 4L))
    // prior that loves the LAST bm25 hit (doc 3, the long filler doc):
    // 1/(60+4)+1/(60+1) > 1/(60+1)+1/(60+2) is false — RRF is a blend,
    // so doc 3 with q_rank 1 must BEAT a doc whose both ranks are worse
    val biased = corpus.select(col("doc_id"),
      when(col("doc_id") === 3L, 1.0).otherwise(0.1).as("score"))
    val fused = Bm25.rrfRerank(hits, biased, "doc_id")
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    val bm25Rank = hits.collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(bm25Rank(3L) === 4L)
    assert(fused(3L) < 4L, s"quality prior should lift doc 3: $fused")
    // determinism
    val again = Bm25.rrfRerank(hits, biased, "doc_id")
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap
    assert(again === fused)
  }
}
