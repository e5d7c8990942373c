package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Sampling}

class CurationSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("DSL pipeline equals the hand-composed operators") {
    val dsl = Curation.run(docs,
      "dedup-exact | lang:en,zh | sample:en=20,zh=60,default=40" +
        " | split:train=80,valid=10,test=10")
    val keep = Dedup.exact(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val hand = Sampling.assignSplit(
      Sampling.stratifiedSample(
        docs.join(keep, "doc_id")
          .where(col("lang").isInCollection(Seq("en", "zh"))),
        "doc_id", "lang", Map("en" -> 20, "zh" -> 60), 40),
      "doc_id", Seq("train" -> 80, "valid" -> 10, "test" -> 10))
    assert(dsl.exceptAll(hand).count() === 0)
    assert(hand.exceptAll(dsl).count() === 0)
    assert(dsl.count() > 0)
  }

  test("quality-floor and max-repetition stages filter as their operators do") {
    val dsl = Curation.run(docs, "quality-floor:0.4 | max-repetition:3/0.2")
    val hand = docs
      .where(Curation.qualityScore(col("text")) >= 0.4)
      .where(graft.functions.Text.dupNgramFrac(col("text"), 3) <= 0.2)
    assert(dsl.exceptAll(hand).count() === 0)
    assert(hand.exceptAll(dsl).count() === 0)
  }

  test("unknown stage and malformed specs fail fast with a named error") {
    val e = intercept[IllegalArgumentException] {
      Curation.parse("dedup-exact | frobnicate:3")
    }
    assert(e.getMessage.contains("frobnicate"))
    intercept[IllegalArgumentException] {
      Curation.parse("split:train80")
    }
  }

  test("where/select generic stages compose") {
    val out = Curation.run(docs, "where:n_chars > 200 | select:doc_id,lang")
    assert(out.columns.toSeq === Seq("doc_id", "lang"))
    assert(out.count() === docs.where(col("n_chars") > 200).count())
  }

  test("doc_curriculum: total permutation, dense per-(stage, shard) " +
    "positions, round-robin source interleave") {
    import org.apache.spark.sql.expressions.Window
    val out = queries.Docs.queries("doc_curriculum")(spark, sfDir).cache()
    val n = docs.count()
    // every doc appears exactly once
    assert(out.count() === n)
    assert(out.select("doc_id").distinct().count() === n)
    // positions are a dense 1..k within every (stage, shard) stream
    val dense = out.groupBy("stage", "shard")
      .agg(count(lit(1)).as("k"), min("pos").as("mn"), max("pos").as("mx"))
    assert(dense.where(col("mn") =!= 1 || col("mx") =!= col("k"))
      .count() === 0)
    // round-robin: the interleave orders a stream by (per-source
    // occurrence number, source), so walking pos order the re-derived
    // occurrence number must be NON-DECREASING — round 1 of every
    // source plays out before any round 2 (sources that deplete simply
    // drop out of later rounds)
    val wOcc = Window.partitionBy("stage", "shard", "source").orderBy("pos")
    val wPrev = Window.partitionBy("stage", "shard").orderBy("pos")
    val occ = out.withColumn("occ", row_number().over(wOcc))
      .withColumn("prev_occ", lag("occ", 1).over(wPrev))
    val bad = occ.where(col("prev_occ").isNotNull
      && col("occ") < col("prev_occ")).count()
    assert(bad === 0)
  }
}
