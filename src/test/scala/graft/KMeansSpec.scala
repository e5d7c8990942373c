package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, KMeans}

class KMeansSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sfDir)
  private lazy val init = AnnIvf.centroids(emb, "label", "embedding")

  test("Lloyd iterations never increase the within-cluster cost") {
    var cent = init
    var prevCost = Double.MaxValue
    for (i <- 1 to 3) {
      val asg = KMeans.assign(emb, "vec_id", "embedding", cent)
      val c = KMeans.cost(emb, "vec_id", "embedding", asg, cent)
      assert(c <= prevCost + 1e-9, s"iteration $i: cost $c > $prevCost")
      prevCost = c
      cent = AnnIvf.centroids(
        emb.join(asg, "vec_id").withColumnRenamed("cluster", "__lbl"),
        "__lbl", "embedding")
    }
  }

  test("fit is deterministic and keeps every vector assigned") {
    val (asg1, cent1) = KMeans.fit(emb, "vec_id", "embedding", init, iters = 2)
    val (asg2, _) = KMeans.fit(emb, "vec_id", "embedding", init, iters = 2)
    assert(asg1.count() === emb.count())
    assert(asg1.exceptAll(asg2).count() === 0)
    assert(asg2.exceptAll(asg1).count() === 0)
    // clusters stay within the seeded label ids
    val k = cent1.count()
    assert(k > 0 && k <= init.count())
  }

  test("fit at 25 iterations stays fast (lineage checkpointed per pass)") {
    // without the per-iteration localCheckpoint each plan nests the
    // previous one and analysis alone takes minutes by iter ~20
    val t0 = System.nanoTime()
    val (asg, cent) = KMeans.fit(
      emb.limit(200), "vec_id", "embedding", init, iters = 25)
    assert(asg.count() === 200)
    assert(cent.count() > 0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 120.0, f"25 iterations took $secs%.1f s - lineage blowup?")
  }

  test("farthest-first init: one seed per planted blob, deterministic") {
    import spark.implicits._
    // three tight, well-separated 2-d blobs
    val pts = (0 until 30).map { i =>
      val (cx, cy) = (i % 3) match {
        case 0 => (0.0f, 0.0f); case 1 => (10.0f, 0.0f); case 2 => (0.0f, 10.0f)
      }
      (i.toLong, Array(cx + (i / 3) * 0.01f, cy + (i / 3) * 0.01f))
    }
    val df = pts.toDF("vec_id", "embedding")
    val seeds = KMeans.initFarthest(df, "vec_id", "embedding", 3)
    assert(seeds.count() === 3)
    val blobs = seeds.collect().map { r =>
      val c = r.getAs[scala.collection.Seq[Double]]("centroid")
      (math.round(c(0) / 10), math.round(c(1) / 10))
    }.toSet
    assert(blobs === Set((0L, 0L), (1L, 0L), (0L, 1L)),
      s"seeds not one-per-blob: $blobs")
    // deterministic
    val again = KMeans.initFarthest(df, "vec_id", "embedding", 3)
    assert(seeds.exceptAll(again).count() === 0)
  }

  test("fit from farthest-first init converges on the embeddings table") {
    val k = 4
    val seeds = KMeans.initFarthest(emb.limit(200), "vec_id", "embedding", k)
    val (asg, cent) = KMeans.fit(emb.limit(200), "vec_id", "embedding",
      seeds, iters = 3)
    assert(cent.count() === k)
    val c0 = KMeans.cost(emb.limit(200), "vec_id", "embedding",
      KMeans.assign(emb.limit(200), "vec_id", "embedding", seeds), seeds)
    val c3 = KMeans.cost(emb.limit(200), "vec_id", "embedding", asg, cent)
    assert(c3 <= c0 + 1e-9, s"cost went up: $c0 -> $c3")
  }

  test("assignment picks the true argmin centroid (spot check)") {
    val cent = init
    val asg = KMeans.assign(emb.limit(20), "vec_id", "embedding", cent)
    val cents = cent.collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Double]]("centroid").toArray).toMap
    val vecs = emb.limit(20)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
      .toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    asg.collect().foreach { r =>
      val v = vecs(r.getLong(0))
      val assigned = r.getLong(1)
      val best = cents.minBy { case (cid, c) => (d2(v, c), cid) }._1
      assert(assigned === best, s"vec ${r.getLong(0)}")
    }
  }

  test("selectDiverse: planted far clusters are picked before near dupes") {
    import spark.implicits._
    // four tight clusters at corners of a square + near-duplicates;
    // greedy k-center with k=4 must pick one vector per corner
    val pts = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(0.1f, 0f)),      // corner A
      (10L, Seq(10f, 0f)), (11L, Seq(10f, 0.1f)),  // corner B
      (20L, Seq(0f, 10f)), (21L, Seq(0.1f, 10f)),  // corner C
      (30L, Seq(10f, 10f)), (31L, Seq(10f, 9.9f))) // corner D
      .toDF("vec_id", "embedding")
    val sel = KMeans.selectDiverse(pts, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sel(0L) === 0L) // seed = min id
    val corners = sel.values.map(_ / 10L).toSet
    assert(corners === Set(0L, 1L, 2L, 3L), s"got $sel")
    // determinism: same input, same picks
    val again = KMeans.selectDiverse(pts, "vec_id", "embedding", k = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === sel)
  }
}
