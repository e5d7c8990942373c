package graft

import org.apache.spark.sql.functions._

import graft.operators.Pca

/** Full PCA pipeline on the real embeddings table: the distributed
  * moment pass must agree with a driver-side brute force, the Jacobi
  * eigensolve must actually diagonalize the covariance, and whitened
  * projections must have identity covariance — the property whitening
  * exists to deliver. */
class PcaSpec extends SparkSpec {

  private val d = 64

  private def embs = Tables.embeddings(spark, sfDir)

  private lazy val moments =
    Pca.gramMoments(embs, "embedding", d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  private lazy val idVecs: Array[(Long, Array[Double])] =
    embs.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)

  private def vecs: Array[Array[Double]] = idVecs.map(_._2)

  test("distributed moments equal driver-side brute force exactly") {
    val n = vecs.length
    val q = vecs.map(_.map(x => math.floor(x * Pca.Scale).toLong))
    val byKey = moments.map { case (i, j, s, mn) => ((i, j), (s, mn)) }.toMap
    assert(byKey.size == d + d * (d + 1) / 2)
    for (i <- 0 until d) {
      assert(byKey((i.toLong, -1L)) == (q.map(_(i)).sum, n.toLong))
      for (j <- i until d)
        assert(byKey((i.toLong, j.toLong))._1 == q.map(v => v(i) * v(j)).sum)
    }
  }

  test("jacobi eigensolve diagonalizes the covariance") {
    val (_, cov, n) = Pca.covarianceFromMoments(moments, d)
    assert(n == vecs.length)
    val (vals, vecsE) = Pca.jacobiEigen(cov)
    // eigenvalues descending, all ≥ 0 for a covariance matrix
    assert(vals.zip(vals.tail).forall { case (a, b) => a >= b - 1e-12 })
    assert(vals.forall(_ >= -1e-9))
    // rows orthonormal
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(k => vecsE(a)(k) * vecsE(b)(k)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-8)
    }
    // C v = λ v for the top component
    val v0 = vecsE(0)
    val cv = (0 until d).map(i => (0 until d).map(j => cov(i)(j) * v0(j)).sum)
    val err = (0 until d).map(i => math.abs(cv(i) - vals(0) * v0(i))).max
    assert(err < 1e-8, s"top eigenpair residual $err")
  }

  test("whitened projections have identity covariance") {
    val (mean, cov, _) = Pca.covarianceFromMoments(moments, d)
    val (vals, vecsE) = Pca.jacobiEigen(cov)
    val k = 8
    val w = Pca.whitener(vals, vecsE, k)
    val proj = Pca.project(embs, "vec_id", "embedding", mean, w)
    val rows = proj.select((0 until k).map(i => col(s"p$i")): _*)
      .collect().map(r => (0 until k).map(r.getDouble).toArray)
    val n = rows.length
    for (a <- 0 until k; b <- a until k) {
      val ma = rows.map(_(a)).sum / n
      val mb = rows.map(_(b)).sum / n
      val c = rows.map(r => (r(a) - ma) * (r(b) - mb)).sum / (n - 1)
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(c - want) < 0.05, s"whitened cov($a,$b) = $c")
    }
  }

  test("diagOod: an injected far-out vector dominates the score; " +
    "constant dimensions contribute zero") {
    import spark.implicits._
    // 40 inliers near the origin (deterministic small offsets), one
    // far outlier; a constant last dimension exercises the var<=0 guard.
    val dd = 4
    val inliers = (1 to 40).map { i =>
      (i.toLong, Array.tabulate(dd)(j =>
        if (j == dd - 1) 7.0f else ((i * (j + 1)) % 5 - 2) * 0.01f).toSeq)
    }
    val out = (99L, Array.tabulate(dd)(j =>
      if (j == dd - 1) 7.0f else 50.0f).toSeq)
    val emb = (inliers :+ out).toDF("vec_id", "embedding")
    val scored = Pca.diagOod(emb, "vec_id", "embedding")
      .orderBy(desc("ood_e9")).collect()
    assert(scored.head.getAs[Long]("vec_id") === 99L)
    val top = scored.head.getAs[Long]("ood_e9")
    val second = scored(1).getAs[Long]("ood_e9")
    assert(top > 10L * second,
      s"outlier should dominate: top=$top second=$second")
    // all-constant corpus → every variance guard trips → score 0
    val const = (1 to 5).map(i => (i.toLong, Seq(1.5f, 2.5f)))
      .toDF("vec_id", "embedding")
    val zeros = Pca.diagOod(const, "vec_id", "embedding")
      .agg(max(abs(col("ood_e9")))).head().getLong(0)
    assert(zeros === 0L)
  }

  test("fixed-direction projection equals the literal dot product") {
    val dirs = Seq(Seq.tabulate(d)(j => (j % 5 - 2) / 2.0))
    val out = Pca.projectFixed(embs, "vec_id", "embedding", dirs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val w6 = dirs.head.map(c => math.floor(c * Pca.Scale).toLong)
    idVecs.foreach { case (id, v) =>
      val expect = (0 until d)
        .map(i => math.floor(v(i) * Pca.Scale).toLong * w6(i)).sum
      assert(out(id) == expect)
    }
  }
}
