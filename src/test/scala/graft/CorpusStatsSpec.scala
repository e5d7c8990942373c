package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram
import graft.queries.Docs

/** C71 tokenizer-fertility stats, C72 LM-score deciles, C73 Zipf fit. */
class CorpusStatsSpec extends SparkSpec {

  test("doc_token_stats sums reconcile with direct corpus totals") {
    val docs = Tables.documents(spark, sfDir)
    val out = Docs.queries("doc_token_stats")(spark, sfDir)
    val totals = out.agg(
      sum("n_docs"), sum("n_chars"), sum("ws_tokens")).head
    assert(totals.getLong(0) == docs.count())
    val direct = docs.agg(
      sum(length(col("text")).cast("long")),
      sum(graft.functions.Text.wsTokenCount(col("text")))).head
    assert(totals.getLong(1) == direct.getLong(0))
    assert(totals.getLong(2) == direct.getLong(1))
    // ratios live on the aggregate: chars/token of single-space word
    // salad is avg word length + 1 side, strictly between 1 and 20
    out.collect().foreach { r =>
      val cpt = r.getAs[Double]("chars_per_ws_token")
      assert(cpt > 1.0 && cpt < 20.0, s"chars_per_ws_token=$cpt")
    }
  }

  test("logProbDeciles partitions each stratum and orders score ranges") {
    val docs = Tables.documents(spark, sfDir)
    val out = Unigram.logProbDeciles(docs, "doc_id", "text", "source")
      .collect()
    val perStratum = out.groupBy(_.getAs[String]("stratum"))
    val docCounts = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perStratum.foreach { case (stratum, rows) =>
      // every doc lands in exactly one decile
      assert(rows.map(_.getAs[Long]("n_docs")).sum == docCounts(stratum))
      // deciles are contiguous score ranges: max of d <= min of d+1
      val sorted = rows.sortBy(_.getAs[Int]("decile"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("lp_max") <= b.getAs[Double]("lp_min") ||
            math.abs(a.getAs[Double]("lp_max") -
              b.getAs[Double]("lp_min")) < 1e-9)
        case _ =>
      }
    }
  }

  test("zipfSlope is negative with full rank coverage on real data") {
    val out = Unigram.zipfSlope(
      Tables.documents(spark, sfDir), "text", "source").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("vocab") > 0)
      assert(r.getAs[Double]("zipf_slope") < 0.0,
        s"slope should be negative: $r")
      val r2 = r.getAs[Double]("zipf_r2")
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
    }
  }

  test("zipfSlope matches the closed-form least squares on a hand case") {
    import spark.implicits._
    // freqs 4,2,1 -> ranks 1,2,3; slope of ln f on ln r computable exactly
    val df = Seq.fill(4)("a").map(t => ("s", t)) ++
      Seq.fill(2)(("s", "b")) ++ Seq(("s", "c"))
    val docs = df.toDF("source", "text") // one token per row
    val out = Unigram.zipfSlope(docs, "text", "source").head
    val pts = Seq((math.log(1), math.log(4)), (math.log(2), math.log(2)),
      (math.log(3), math.log(1)))
    val n = pts.size
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(out.getAs[Double]("zipf_slope") -
      math.rint(slope * 1e4) / 1e4) < 1e-9)
    assert(out.getAs[Long]("vocab") == 3)
    assert(out.getAs[Long]("n_tokens") == 7)
  }
}
