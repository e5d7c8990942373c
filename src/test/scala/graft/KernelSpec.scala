package graft

import org.apache.spark.sql.functions._

import graft.functions.{SetOps, Text, Vectors}
import graft.operators.MinHash

/** The native codegen kernels must compute EXACTLY what their
  * declarative (HOF) forms compute — these specs pin that equivalence,
  * so a kernel bug can never silently diverge from the oracle story. */
class KernelSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir).limit(100)
  private lazy val docs = Tables.documents(spark, sfDir).limit(100)

  test("DotProduct == aggregate(zip_with(...)) bit-for-bit") {
    val pairs = emb.select(Vectors.toDouble(col("embedding")).as("a"))
      .crossJoin(emb.limit(5).select(Vectors.toDouble(col("embedding")).as("b")))
    val hof = aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _)
    val diff = pairs.where(Vectors.dot(col("a"), col("b")) =!= hof).count()
    assert(diff === 0)
  }

  test("ShingleHashes == sorted distinct conv(md5) of declarative shingles") {
    val declarative = sort_array(array_distinct(
      transform(MinHash.shingles(col("text"), 3),
        s => conv(substring(md5(s), 1, 8), 16, 10).cast("long"))))
    val diff = docs.where(
      MinHash.hashedShingles(col("text"), 3) =!= declarative).count()
    assert(diff === 0)
  }

  test("ShingleStrings == array_distinct of the declarative shingle HOF") {
    val diff = docs.where(
      graft.functions.SetOps.shingleStrings(col("text"), 3)
        =!= MinHash.shingles(col("text"), 3)).count()
    assert(diff === 0)
    // edge rows the corpus may not cover: short text, trailing blanks
    val edge = spark.createDataFrame(Seq(
      (1L, "a b"), (2L, ""), (3L, "a b c"), (4L, "x y z  "),
      (5L, "a a a a a"))).toDF("id", "text")
    val ediff = edge.where(
      graft.functions.SetOps.shingleStrings(col("text"), 3)
        =!= MinHash.shingles(col("text"), 3)).count()
    assert(ediff === 0)
  }

  test("WinnowFingerprints == declarative window-min over positional gram hashes") {
    val grams = expr(
      "transform(sequence(1, size(__t) - 2), i -> " +
        "conv(substring(md5(concat_ws(' ', element_at(__t, i), " +
        "element_at(__t, CAST(i + 1 AS INT)), " +
        "element_at(__t, CAST(i + 2 AS INT)))), 1, 8), 16, 10))")
    val minima = expr(
      "transform(sequence(1, size(__h) - 3), p -> array_min(slice(__h, p, 4)))")
    val declarative = docs
      .withColumn("__t", Text.tokens(col("text")))
      .where(size(col("__t")) >= 6) // >= w+2 grams
      .withColumn("__h", grams.cast("array<long>"))
      .withColumn("__want", array_sort(array_distinct(minima)))
    val diff = declarative.where(
      SetOps.winnowFingerprints(col("text"), 3, 4) =!= col("__want")).count()
    assert(diff === 0)
    // short docs (< w gram hashes) return an empty fingerprint array
    val short = { import spark.implicits._
      Seq("a b c d e", "a b c", "a").toDF("text") }
    val bad = short.where(
      size(SetOps.winnowFingerprints(col("text"), 3, 4)) =!= 0).count()
    assert(bad === 0)
  }

  test("MinHashArray == per-permutation array_min(transform(...))") {
    val hv = MinHash.hashedShingles(col("text"), 3)
    val declarative = array(MinHash.coeffs.map { case (a, b) =>
      array_min(transform(hv, h => (h * a + b) % MinHash.P))
    }: _*)
    val kernel = SetOps.minhashArray(hv,
      MinHash.coeffs.map(_._1), MinHash.coeffs.map(_._2), MinHash.P)
    assert(docs.where(kernel =!= declarative).count() === 0)
  }

  test("SortedIntersectCount == size(array_intersect) on sorted distinct arrays") {
    val a = MinHash.hashedShingles(col("t1"), 2)
    val b = MinHash.hashedShingles(col("t2"), 2)
    val pairs = docs.select(col("text").as("t1"))
      .crossJoin(docs.limit(10).select(col("text").as("t2")))
    val diff = pairs.where(
      SetOps.sortedIntersectCount(a, b) =!=
        size(array_intersect(a, b)).cast("long")).count()
    assert(diff === 0)
  }

  test("SimHashHalf == declarative 64x bit-majority") {
    val tk = array_distinct(split(col("text"), " "))
    def hash32(c: org.apache.spark.sql.Column, hexOffset: Int) =
      conv(substring(md5(c), hexOffset, 8), 16, 10).cast("long")
    def declarativeHalf(hexOffset: Int) = {
      val hv = transform(tk, t => hash32(t, hexOffset))
      val n = size(tk)
      (0 until 32).map { j =>
        when(lit(2) * size(filter(hv,
          h => shiftright(h, j).bitwiseAND(lit(1L)) === lit(1L))) >= n,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    val diffHi = docs.where(
      SetOps.simHashHalf(tk, 0) =!= declarativeHalf(1)).count()
    val diffLo = docs.where(
      SetOps.simHashHalf(tk, 4) =!= declarativeHalf(9)).count()
    assert(diffHi === 0)
    assert(diffLo === 0)
  }

  test("Text.fingerprint matches a driver-side reimplementation") {
    val rows = docs.select(col("text"),
      Text.fingerprint(col("text")).as("fp")).collect()
    rows.foreach { r =>
      val expected = r.getString(0).foldLeft(0L)(
        (acc, ch) => (acc * 131 + ch.toLong) % 1000000007L)
      assert(r.getLong(1) === expected)
    }
  }

  test("RollingHash == declarative aggregate(split(text,''), ...) fold") {
    val declarative = aggregate(split(col("text"), ""), lit(0L),
      (acc, ch) => pmod(acc * lit(131L) + ascii(ch), lit(1000000007L)))
    val edge = { import spark.implicits._; Seq("", " ", "a", "ab c", "ümlaut ß").toDF("text") }
    Seq(docs.select(col("text")), edge).foreach { df =>
      val diff = df.where(Text.fingerprint(col("text")) =!= declarative).count()
      assert(diff === 0)
    }
  }

  test("dupNgramFrac: planted repetition scores as expected; short docs score 0") {
    import spark.implicits._
    val df = Seq(
      ("aaa bbb aaa bbb aaa bbb", 3.0 / 5, 2.0 / 4), // 5 2-grams 2 uniq; 4 3-grams 2 uniq
      ("one two three four five", 0.0, 0.0),          // no repeats
      ("solo", 0.0, 0.0),                             // shorter than any gram
      ("", 0.0, 0.0)
    ).toDF("text", "want2", "want3")
    val bad = df.where(
      Text.dupNgramFrac(col("text"), 2) =!= round(col("want2"), 4) ||
      Text.dupNgramFrac(col("text"), 3) =!= round(col("want3"), 4)).count()
    assert(bad === 0)
  }

  test("CharEntropyE9 == declarative explode→groupBy entropy on the e9 ladder") {
    val cnt = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("doc_id").agg(sum("c").cast("double").as("t"))
    val declarative = cnt.join(tot, "doc_id")
      .withColumn("c9",
        round((col("c") / col("t")) * log(col("c") / col("t")) * lit(-1.0), 9))
      .groupBy("doc_id")
      .agg(sum((round(col("c9"), 9) * 1e9).cast("decimal(38,0)"))
        .cast("long").as("e9d"))
    val native = docs.select(col("doc_id"),
      SetOps.charEntropyE9(col("text")).as("e9n"))
    val joined = native.join(declarative, "doc_id")
    assert(joined.count() === docs.count())
    val diff = joined.where(col("e9n") =!= col("e9d")).count()
    assert(diff === 0)
    // single-char and empty edge rows: entropy exactly 0
    val edge = { import spark.implicits._
      Seq("", "aaaa", "x").toDF("text") }
    assert(edge.where(SetOps.charEntropyE9(col("text")) =!= 0L).count() === 0)
  }

  test("StopwordHits == per-language size(filter(tokens(lower), isin)) HOFs") {
    val declarative = Text.stopwords.map { case (_, words) =>
      size(filter(split(lower(col("text")), " "),
        t => t.isin(words.map(lit(_)): _*))).cast("long")
    }
    val kernel = Text.allLangHits(col("text"))
    val edge = { import spark.implicits._
      Seq("", "the the THE el le der", "  a  of ", "y es una the la").toDF("text") }
    Seq(docs.select(col("text")), edge).foreach { df =>
      val diff = df.where(kernel =!= array(declarative: _*)).count()
      assert(diff === 0)
    }
  }

  test("TopTokenCount == declarative explode→groupBy(doc,token)→max") {
    val declarative = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("want"))
    val native = docs.select(col("doc_id"),
      Text.topTokenCount(col("text")).as("got"))
    val joined = native.join(declarative, "doc_id")
    assert(joined.count() === docs.count())
    assert(joined.where(col("got") =!= col("want")).count() === 0)
    // edge rows: empty string is ONE empty token (split semantics);
    // all-same-token rows count the full run
    val edge = { import spark.implicits._
      Seq("" -> 1L, "a a a a" -> 4L, "x" -> 1L, "a b a b b" -> 3L)
        .toDF("text", "want") }
    assert(edge.where(
      Text.topTokenCount(col("text")) =!= col("want")).count() === 0)
  }
}
