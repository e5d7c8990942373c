package graft

import org.apache.spark.sql.functions._

import graft.operators.LogReg

/** C83 trainable quality filter — determinism, learning direction, and
  * ladder-bounds pins for the in-engine logistic regression. */
class LogRegSpec extends SparkSpec {

  /** Synthetic separable corpus: 'en' docs are long with normal word
    * structure; 'xx' docs are short unbroken runs (no spaces). */
  private def toyDocs = {
    import spark.implicits._
    val en = (1 to 40).map { i =>
      val text = Seq.fill(50 + i)("word").mkString(" ")
      (i.toLong, text, "en", "web", text.length.toLong)
    }
    val xx = (41 to 80).map { i =>
      val text = "x" * (20 + i)
      (i.toLong, text, "xx", "web", text.length.toLong)
    }
    (en ++ xx).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("train is deterministic: two runs produce identical weights") {
    val feat = LogReg.featurize(toyDocs).persist()
    try {
      val w1 = LogReg.train(feat)
      val w2 = LogReg.train(feat)
      assert(w1.toSeq === w2.toSeq)
    } finally feat.unpersist(blocking = false)
  }

  test("gradient descent moves weights toward the separating direction " +
    "and separates the toy corpus") {
    val feat = LogReg.featurize(toyDocs).persist()
    try {
      val w = LogReg.train(feat)
      // en docs have larger space-fraction (x2) and larger length (x1):
      // err = p - y is negative on en rows, so both feature weights climb.
      assert(w(1) > 0.0, s"length weight should be positive, got ${w(1)}")
      assert(w(2) > 0.0, s"space-frac weight should be positive, got ${w(2)}")
      val scored = feat.withColumn("p_e9", LogReg.pE9(w))
      val enMin = scored.where(col("y") === 1L)
        .agg(min("p_e9")).head().getLong(0)
      val xxMax = scored.where(col("y") === 0L)
        .agg(max("p_e9")).head().getLong(0)
      assert(enMin > xxMax,
        s"separable corpus should separate: en min $enMin <= xx max $xxMax")
    } finally feat.unpersist(blocking = false)
  }

  test("p_e9 stays on the [0, 1e9] ladder for extreme weights") {
    val feat = LogReg.featurize(toyDocs)
    val scored = feat.withColumn("p_e9", LogReg.pE9(Array(-50.0, 40.0, -90.0)))
    val row = scored.agg(min("p_e9"), max("p_e9")).head()
    assert(row.getLong(0) >= 0L)
    assert(row.getLong(1) <= 1000000000L)
  }

  test("real corpus: every source reports, flags are within doc counts") {
    val feat = LogReg.featurize(Tables.documents(spark, sfDir)).persist()
    try {
      val w = LogReg.train(feat)
      val rep = LogReg.scoreBySource(feat, w).collect()
      assert(rep.nonEmpty)
      rep.foreach { r =>
        val n = r.getAs[Long]("n_docs")
        val f = r.getAs[Long]("n_flagged")
        assert(f >= 0L && f <= n)
        val sumP = r.getAs[Long]("sum_p_e9")
        assert(sumP >= 0L && sumP <= n * 1000000000L)
      }
    } finally feat.unpersist(blocking = false)
  }
}
