package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnEval
import graft.queries.Docs

/** C74 ANN recall self-evaluation, C75 IVF list balance. */
class AnnEvalSpec extends SparkSpec {

  test("recallReport counts hits against the exact set (hand case)") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("probe_id", "neighbor_id")
    val path = Seq((1L, 10L), (1L, 99L), (2L, 10L), (2L, 12L))
      .toDF("probe_id", "neighbor_id")
    val out = AnnEval.recallReport(exact, Seq("m" -> path))
      .collect().map(r => r.getAs[Long]("probe_id") ->
        (r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))).toMap
    assert(out(1L) == (1L, 0.5))
    assert(out(2L) == (2L, 1.0))
  }

  test("recallReport keeps probes with zero approx results as recall 0") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (2L, 10L)).toDF("probe_id", "neighbor_id")
    val empty = Seq.empty[(Long, Long)].toDF("probe_id", "neighbor_id")
    val out = AnnEval.recallReport(exact, Seq("dead" -> empty)).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getAs[Long]("n_returned") == 0L)
      assert(r.getAs[Double]("recall") == 0.0)
    }
  }

  test("emb_ann_recall reports every deployed tier for every probe") {
    val out = Docs.queries("emb_ann_recall")(spark, sfDir).collect()
    val methods = out.map(_.getAs[String]("method")).toSet
    assert(methods == Set("lsh", "ivf", "pq", "ivfpq", "pq_learned"))
    val probes = out.map(_.getAs[Long]("probe_id")).toSet
    // 8 probes x 5 methods, every pair present
    assert(out.length == probes.size * 5)
    out.foreach { r =>
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_exact"))
    }
    // macro recall of the LSH tier matches the DocsOpsSpec >= 0.3 gate
    val lsh = out.filter(_.getAs[String]("method") == "lsh")
    val macroR = lsh.map(_.getAs[Long]("n_hit")).sum.toDouble /
      lsh.map(_.getAs[Long]("n_exact")).sum
    assert(macroR >= 0.3, s"lsh macro recall $macroR")
  }

  test("emb_ann_mrl: full spine, recall in [0,1], full-width prefix is " +
    "the identity (recall exactly 1)") {
    import graft.operators.{AnnEval, Similarity}
    val out = Docs.queries("emb_ann_mrl")(spark, sfDir).collect()
    // 3 tiers x 8 probes, every recall bounded
    assert(out.length === 24)
    out.foreach { r =>
      val recall = r.getAs[Double]("recall")
      assert(recall >= 0.0 && recall <= 1.0)
    }
    // truncating to the FULL width must reproduce the baseline exactly
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.where(col("vec_id") >= 8)
    val probes = e.where(col("vec_id") < 8)
    def trunc(df: org.apache.spark.sql.DataFrame) = df.select(
      col("vec_id"), slice(col("embedding"), 1, 64).as("embedding"))
    val exact = Similarity.annTopK(corpus, probes,
      idCol = "vec_id", vecCol = "embedding", k = 5)
    val full = AnnEval.recallReport(exact, Seq("mrl64" ->
      Similarity.annTopK(trunc(corpus), trunc(probes),
        idCol = "vec_id", vecCol = "embedding", k = 5)))
    assert(full.where(col("recall") =!= 1.0).count() === 0)
  }

  test("emb_ivf_balance fractions sum to 1 and balance averages 1") {
    val out = Docs.queries("emb_ivf_balance")(spark, sfDir).collect()
    assert(out.nonEmpty && out.length <= 4)
    val fracSum = out.map(_.getAs[Double]("frac")).sum
    assert(math.abs(fracSum - 1.0) < 0.01, s"frac sum $fracSum")
    val total = out.map(_.getAs[Long]("n_vecs")).sum
    assert(total == Tables.embeddings(spark, sfDir).count())
  }
}
