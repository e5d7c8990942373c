package graft

import graft.operators.Dedup

/** Substring-span dedup on planted corpora where the right extents are
  * computable by hand: shared runs are found at token granularity,
  * overlapping k-gram hits merge into one maximal span, unique text
  * yields nothing, and within-document repetition counts too. */
class SpanDedupSpec extends SparkSpec {

  private def spans(docs: Seq[(Long, String)], k: Int) = {
    import spark.implicits._
    Dedup.duplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("a shared 5-token run in distinct docs is marked exactly, merged") {
    // tokens 2..6 of doc 1 == tokens 0..4 of doc 2 (5 shared tokens =
    // two overlapping 4-grams each -> one merged span per doc)
    val docs = Seq(
      1L -> "x1 x2 common a b c d y1 y2",
      2L -> "common a b c d z1 z2 z3")
    assert(spans(docs, k = 4) == Seq(
      (1L, 2L, 6L, 5L),
      (2L, 0L, 4L, 5L)))
  }

  test("unique text yields no spans") {
    val docs = Seq(1L -> "a b c d e f", 2L -> "g h i j k l")
    assert(spans(docs, k = 3).isEmpty)
  }

  test("within-document repetition is caught") {
    val docs = Seq(1L -> "p q r u1 u2 u3 p q r")
    assert(spans(docs, k = 3) == Seq((1L, 0L, 2L, 3L), (1L, 6L, 8L, 3L)))
  }

  test("two disjoint shared runs stay two spans") {
    val docs = Seq(
      1L -> "s1 s2 s3 mid1 mid2 mid3 mid4 t1 t2 t3",
      2L -> "s1 s2 s3 other1 other2 other3 t1 t2 t3")
    assert(spans(docs, k = 3) == Seq(
      (1L, 0L, 2L, 3L), (1L, 7L, 9L, 3L),
      (2L, 0L, 2L, 3L), (2L, 6L, 8L, 3L)))
  }
}
