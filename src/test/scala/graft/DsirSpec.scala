package graft

import org.apache.spark.sql.functions._

import graft.operators.Dsir

/** DSIR importance-weight semantics on a planted two-domain corpus:
  * target-like documents must score positive, off-domain negative,
  * mixed in between, and the ordering must be monotone in target
  * affinity. */
class DsirSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "tgt", "spark shuffle spark shuffle spark shuffle"),
      (2L, "raw", "spark shuffle spark shuffle spark shuffle"),
      (3L, "raw", "flour sugar flour sugar flour sugar"),
      (4L, "raw", "spark shuffle flour sugar spark shuffle"),
      (5L, "raw", "flour sugar flour sugar flour sugar"),
      (6L, "raw", "butter salt butter salt butter salt"),
      (7L, "raw", "flour sugar butter salt flour sugar"),
      (8L, "raw", "salt flour salt flour salt flour"),
      (9L, "raw", "sugar butter sugar butter sugar butter")
    ).toDF("doc_id", "dom", "text")
  }

  // buckets sized to the toy corpus: with the default 1024 the +1
  // Laplace mass drowns a 5-bigram target model and everything scores
  // negative (a real DSIR property, not a bug — B must be in
  // proportion to target-model mass)
  private def weights = Dsir.importanceWeights(
    corpus, "doc_id", "text", col("dom") === "tgt", buckets = 16)
    .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("target-like docs score positive, off-domain negative") {
    val w = weights
    assert(w(2L) > 0, s"target-identical doc got ${w(2L)}")
    assert(w(3L) < 0, s"off-domain doc got ${w(3L)}")
    assert(w(2L) > w(4L) && w(4L) > w(3L),
      s"ordering broken: ${w(2L)} / ${w(4L)} / ${w(3L)}")
  }

  test("identical texts get identical weights") {
    val w = weights
    assert(w(1L) == w(2L))
    assert(w(3L) == w(5L))
  }
}
