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
}
