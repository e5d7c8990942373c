package graft

import org.apache.spark.sql.functions._

import graft.operators.{MinHash, PrefixJoin}

/** C106 contracts: the prefix-filtered join must be LOSSLESS (equal to
  * the brute-force all-pairs join — the property that separates it
  * from heuristic blocking), exact on planted pairs, and must fail
  * fast rather than silently drop hot prefix postings. */
class PrefixJoinSpec extends SparkSpec {

  test("planted pairs: exact shingle jaccard, threshold respected") {
    import spark.implicits._
    // shingle sets (n=3): doc1 {abc,bcd,cde}, doc2 shares {abc,bcd}
    // of its 3 → ∩=2, ∪=4 → 0.5 < 0.7; doc4 = exact dup of doc1 → 1.0;
    // doc5 shares {bcd,cde} + adds none (set {bcd,cde}) → ∩=2, ∪=3 →
    // 0.6667 < 0.7; doc6 = doc1 plus one trailing word → sets
    // {abc,bcd,cde} vs {abc,bcd,cde,def}: ∩=3, ∪=4 → 0.75 ≥ 0.7
    val docs = Seq(
      1L -> "a b c d e",
      2L -> "a b c d x",
      4L -> "a b c d e",
      5L -> "b c d e",
      6L -> "a b c d e f"
    ).toDF("doc_id", "text")
    val got = PrefixJoin.jaccardPairs(docs, "doc_id", "text", 7, 10)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(5)))
    assert(got.toSeq === Seq((1L, 4L, 3L, 1.0), (1L, 6L, 3L, 0.75),
      (4L, 6L, 3L, 0.75)))
  }

  test("lossless: equals the brute-force all-pairs join on real data") {
    val docs = Tables.documents(spark, sfDir)
    val got = PrefixJoin.jaccardPairs(docs, "doc_id", "text", 7, 10)
      .select("doc_a", "doc_b", "inter", "size_a", "size_b")
    // brute force: every pair sharing ANY shingle (pairs sharing none
    // have jaccard 0 < t), exact integer verify — no prefix pruning
    val tok = docs.select(col("doc_id"),
        explode(MinHash.shingles(col("text"), 3)).as("token"))
      .distinct()
    val sz = tok.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = tok.select(col("doc_id").as("doc_a"), col("token"))
      .join(tok.select(col("doc_id").as("doc_b"), col("token")), "token")
      .where(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    val want = inter
      .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("size_a")),
        "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("size_b")),
        "doc_b")
      .where(lit(10L) * col("inter") >=
        lit(7L) * (col("size_a") + col("size_b") - col("inter")))
      .select("doc_a", "doc_b", "inter", "size_a", "size_b")
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
    assert(want.count() > 0, "degenerate corpus: no similar pairs at t=0.7")
  }

  test("hot prefix posting fails fast instead of dropping") {
    import spark.implicits._
    // every doc is the same 3 words: the one shingle's prefix posting
    // holds all of them; with maxPosting=2 the guard must abort
    val docs = (1L to 5L).map(_ -> "x y z").toDF("doc_id", "text")
    val e = intercept[Exception] {
      PrefixJoin.jaccardPairs(docs, "doc_id", "text", 7, 10,
        maxPosting = 2L).count()
    }
    assert(e.getMessage.contains("maxPosting") ||
      e.getCause != null && e.getCause.getMessage.contains("maxPosting"))
  }
}
