package graft

import org.apache.spark.sql.functions._

import graft.operators.Pq

/** Product quantization (C66): codes are in-range and deterministic,
  * encoding picks the truly-nearest sub-centroid, and ADC ranking
  * recalls a useful fraction of the exact-L2 top-k (the honest PQ
  * metric — PQ approximates L2, not cosine). */
class PqSpec extends SparkSpec {

  private val numSub = 16
  private val k = 16
  private val subDim = 4

  test("codes are 0..k-1 and identical across runs") {
    val e = Tables.embeddings(spark, sfDir)
    val a = Pq.encode(e, "vec_id", "embedding").collect()
    val b = Pq.encode(e, "vec_id", "embedding").collect()
    assert(a.toSeq === b.toSeq)
    for (r <- a; s <- 0 until numSub) {
      val c = r.getAs[Long](s"code$s")
      assert(c >= 0 && c < k)
    }
  }

  test("encode picks the nearest sub-centroid by exact L2 (JVM reference)") {
    val e = Tables.embeddings(spark, sfDir).limit(16)
    val vecs = e.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val codes = Pq.encode(e, "vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> (0 until numSub).map(s =>
        r.getAs[Long](s"code$s"))).toMap
    for ((id, v) <- vecs; s <- 0 until numSub) {
      val sub = v.slice(s * subDim, (s + 1) * subDim)
      val dists = (0 until k).map { c =>
        val cent = Pq.centroid(numSub, subDim, s, c)
        sub.zip(cent).map { case (x, y) => (x - y) * (x - y) }.sum
      }
      // leftmost min (the argmax-of-surrogate chain's tiebreak); allow
      // the round(9) ladder to flip exact ties only
      val best = dists.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      val got = codes(id)(s).toInt
      assert(math.abs(dists(got) - dists(best)) < 1e-7,
        s"vec $id sub $s: got code $got (d=${dists(got)}), " +
          s"nearest $best (d=${dists(best)})")
    }
  }

  test("ADC top-5 recalls >= 0.3 of the exact-L2 top-5") {
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.where(col("vec_id") >= 8)
    val probes = e.where(col("vec_id") < 8)
    val got = Pq.annTopK(corpus, probes, "vec_id", "embedding", topK = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // exact L2 top-5 per probe, brute force on the driver
    val cv = corpus.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val pv = probes.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val exact = pv.flatMap { case (pid, p) =>
      cv.map { case (cid, c) =>
        (pid, cid, p.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.sortBy { case (_, cid, d) => (d, cid) }.take(5)
        .map { case (_, cid, _) => (pid, cid) }
    }.toSet
    val hits = got.count(exact.contains)
    assert(exact.nonEmpty && hits.toDouble / exact.size >= 0.3,
      s"recall=${hits.toDouble / exact.size}")
  }

  test("refined rerank: recall@5 vs exact-L2 beats (or equals) raw ADC, " +
    "and distances come out exactly sorted") {
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.where(col("vec_id") >= 8)
    val probes = e.where(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val raw = pairs(Pq.annTopK(corpus, probes, "vec_id", "embedding", 5))
    val refined = Pq.annTopKRefined(corpus, probes, "vec_id", "embedding",
      topK = 5, shortlist = 20)
    val refinedRows = refined.collect()
    val cv = corpus.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val pv = probes.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val exact = pv.flatMap { case (pid, p) =>
      cv.map { case (cid, c) =>
        (pid, cid, p.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.sortBy { case (_, cid, d) => (d, cid) }.take(5)
        .map { case (_, cid, _) => (pid, cid) }
    }.toSet
    val rawRecall = raw.count(exact.contains).toDouble / exact.size
    val refRecall = pairs(refined).count(exact.contains).toDouble / exact.size
    assert(refRecall >= rawRecall,
      s"refine must not hurt recall: raw=$rawRecall refined=$refRecall")
    assert(refRecall >= 0.5, s"refined recall=$refRecall")
    // within each probe, l2_e9 ascends with rank (exact order)
    refinedRows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(byRank.sameElements(byRank.sorted))
    }
  }

  test("learned codebook: recall@5 >= the formula codebook's recall@5") {
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.where(col("vec_id") >= 8)
    val probes = e.where(col("vec_id") < 8)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val cv = corpus.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val pv = probes.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
    val exact = pv.flatMap { case (pid, p) =>
      cv.map { case (cid, c) =>
        (pid, cid, p.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.sortBy { case (_, cid, d) => (d, cid) }.take(5)
        .map { case (_, cid, _) => (pid, cid) }
    }.toSet
    val formula = pairs(Pq.annTopK(corpus, probes, "vec_id", "embedding", 5))
    val cb = Pq.learnCodebook(corpus, "vec_id", "embedding")
    val learned = pairs(Pq.annTopK(corpus, probes, "vec_id", "embedding", 5,
      codebook = cb))
    val fRecall = formula.count(exact.contains).toDouble / exact.size
    val lRecall = learned.count(exact.contains).toDouble / exact.size
    assert(lRecall >= fRecall,
      s"learned codebook must not lose recall: formula=$fRecall learned=$lRecall")
  }

  test("learned codebook is deterministic across runs") {
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.where(col("vec_id") >= 8)
    val a = Pq.learnCodebook(corpus, "vec_id", "embedding")
    val b = Pq.learnCodebook(corpus, "vec_id", "embedding")
    for (s <- 0 until numSub; c <- 0 until k)
      assert(a(s, c) === b(s, c), s"codebook drift at subspace $s centroid $c")
  }

  test("ADC ranks a vector's own code-identical twin first") {
    import spark.implicits._
    // probe 0 IS corpus vector 100 (identical floats): PQ must rank it
    // rank 1 — same codes maximize every table lookup simultaneously
    val base = (0 until 64).map(j => ((j * 37) % 19 - 9) / 9.0f)
    val noise = (1 to 30).map { i =>
      (100L + i, (0 until 64).map(j => ((i * 13 + j * 7) % 23 - 11) / 11.0f))
    }
    val corpus = ((100L, base) +: noise).toDF("vec_id", "embedding")
    val probe = Seq((0L, base)).toDF("vec_id", "embedding")
    val top = Pq.annTopK(corpus, probe, "vec_id", "embedding", topK = 1)
      .collect()
    assert(top.length === 1 && top.head.getLong(2) === 100L)
  }

  test("kernel encode == staged declarative encode, both codebooks") {
    val emb = Tables.embeddings(spark, sfDir).limit(120)
    for (cb <- Seq(null, Pq.learnCodebook(emb, "vec_id", "embedding"))) {
      val a = Pq.encode(emb, "vec_id", "embedding", codebook = cb)
      val b = Pq.encodeDeclarative(emb, "vec_id", "embedding", codebook = cb)
      assert(a.exceptAll(b).count() === 0)
      assert(b.exceptAll(a).count() === 0)
    }
  }
}