package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE merge learning on corpora where the right merge sequence is
  * computable by hand: greedy left-to-right application, deterministic
  * count-then-lexicographic tiebreaks, early stop below minCount, and
  * a lossless round-trip back to the original text. */
class BpeSpec extends SparkSpec {

  import Bpe.Joiner

  private def df(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  private def toks(d: org.apache.spark.sql.DataFrame) =
    d.orderBy("doc_id").collect().map(_.getSeq[String](2).toList).toList

  test("greedy left-to-right: 'a a a' merges once") {
    val corpus = df("a a a", "a a a")
    val m = Bpe.learnMerges(corpus, "text", nMerges = 1)
    assert(m == Seq(("a", "a")))
    assert(toks(Bpe.tokenize(corpus, "text", m)) ==
      List(List(s"a${Joiner}a", "a"), List(s"a${Joiner}a", "a")))
  }

  test("merge sequence follows counts, then builds on merged symbols") {
    // 'x y' appears 3x, 'y z' 2x (after 'x y' merges, 'x+y z' twice)
    val corpus = df("x y z", "x y z", "x y")
    val m = Bpe.learnMerges(corpus, "text", nMerges = 2)
    assert(m == Seq(("x", "y"), (s"x${Joiner}y", "z")))
    assert(toks(Bpe.tokenize(corpus, "text", m)) == List(
      List(s"x${Joiner}y${Joiner}z"),
      List(s"x${Joiner}y${Joiner}z"),
      List(s"x${Joiner}y")))
  }

  test("count ties break lexicographically; early stop below minCount") {
    val corpus = df("b c", "a c", "b c", "a c")
    // (a,c) and (b,c) both count 2 -> (a,c) wins the tie; after that
    // no remaining pair reaches minCount=2 and learning stops early
    val m = Bpe.learnMerges(corpus, "text", nMerges = 5)
    assert(m == Seq(("a", "c"), ("b", "c")))
  }

  test("the compiled kernel ≡ the declarative applyMerge fold on " +
    "chain/overlap/null edge cases") {
    import spark.implicits._
    val cases = Seq("a a a a", "a a a", "a", "", "b a a b a a a",
      "x a a x", "a b a b a").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Seq(("a", "a"), (s"a${Joiner}a", "b"))
    val viaFold = merges.foldLeft(split(col("text"), " ")) {
      case (c, (l, r)) => Bpe.applyMerge(c, l, r)
    }
    val both = cases.select(col("doc_id"),
      graft.functions.SetOps.bpeMergeTokens(
        split(col("text"), " "), merges, Joiner).as("k"),
      viaFold.as("f"))
    assert(both.where(not(col("k") <=> col("f"))).count() === 0)
  }

  test("round-trip: un-joining merged tokens restores the corpus") {
    val corpus = df("the quick fox the quick dog", "the quick fox jumps")
    val m = Bpe.learnMerges(corpus, "text", nMerges = 3)
    val back = Bpe.tokenize(corpus, "text", m)
      .select(col("doc_id"), col("text"),
        array_join(transform(col("bpe_tokens"),
          t => regexp_replace(t, "\\" + Joiner, " ")), " ").as("rt"))
      .where(col("rt") =!= col("text"))
    assert(back.count() == 0)
  }
}
