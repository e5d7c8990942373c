package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnLsh, Dedup, MinHash, Similarity}
import graft.queries.Docs

class DocsOpsSpec extends SparkSpec {

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    import spark.implicits._
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val next = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(prev, next, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("emb_ann_lsh recall@5 vs the exact baseline is >= 0.3") {
    def pairs(name: String): Set[(Long, Long)] =
      Docs.queries(name)(spark, sfDir)
        .select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("emb_ann_topk")
    val approx = pairs("emb_ann_lsh")
    assert(exact.nonEmpty)
    val recall = (exact intersect approx).size.toDouble / exact.size
    // 4 bands x 4 bits => P(candidate) ~= 0.5 for true neighbours here;
    // the planes are fixed, so this is deterministic, not flaky.
    assert(recall >= 0.3, s"recall@5 = $recall")
  }

  test("emb_ann_ivf recall@5 vs the exact baseline is >= 0.3") {
    def pairs(name: String): Set[(Long, Long)] =
      Docs.queries(name)(spark, sfDir)
        .select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs("emb_ann_topk")
    val ivf = pairs("emb_ann_ivf")
    assert(exact.nonEmpty)
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall@5 = $recall")
  }

  test("emb_ann_lsh only returns pairs the exact scorer agrees on") {
    val lsh = Docs.queries("emb_ann_lsh")(spark, sfDir)
      .select("probe_id", "neighbor_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exactCos = Similarity.annTopK(
      Tables.embeddings(spark, sfDir).where(col("vec_id") >= 8),
      Tables.embeddings(spark, sfDir).where(col("vec_id") < 8),
      "vec_id", "embedding", k = 1000)
      .select("probe_id", "neighbor_id", "cos_sim").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    lsh.foreach { case (k, v) =>
      assert(exactCos.get(k).contains(v), s"cos mismatch for $k")
    }
  }

  test("emb_neardup_lsh returns a verified subset of the exact pairs with recall >= 0.3") {
    def pairs(name: String): Map[(Long, Long), Double] =
      Docs.queries(name)(spark, sfDir)
        .select("id_a", "id_b", "cos_sim").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val exact = pairs("emb_neardup")
    val lsh = pairs("emb_neardup_lsh")
    assert(exact.nonEmpty)
    // every LSH pair is an exact pair with the identical cosine
    lsh.foreach { case (k, v) => assert(exact.get(k).contains(v), s"$k") }
    val recall = lsh.size.toDouble / exact.size
    assert(recall >= 0.3, s"recall = $recall")
  }

  test("minhash LSH finds only verified near-dups (jaccard >= threshold)") {
    val rows = MinHash.neardupPairs(Tables.documents(spark, sfDir),
      "doc_id", "text", threshold = 0.5).collect()
    assert(rows.nonEmpty, "planted near-dups should be found")
    rows.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Double]("jaccard") >= 0.5)
    }
  }

  test("exact dedup collapses a duplicated corpus to one keeper per text") {
    val docs = Tables.documents(spark, sfDir)
    val n = docs.count()
    val out = Dedup.exact(docs.unionAll(docs), "doc_id", "text")
    assert(out.count() === docs.select("text").distinct().count())
    assert(out.where(col("n_copies") < 2).count() === 0)
  }

  test("markDuplicates flags every non-keeper copy") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val doubled = docs.unionAll(docs.withColumn("doc_id", col("doc_id") + 1000000))
    val marked = Dedup.markDuplicates(doubled, "doc_id", "text")
    assert(marked.where(col("is_duplicate")).count() === 50)
    assert(marked.where(!col("is_duplicate")).count() === 50)
  }

  test("simhash pigeonhole: hamming<=3 always found; a distance-4 pair " +
    "split across all four chunks is missed (the documented recall cap)") {
    import spark.implicits._
    // chunk layout: (hi>>16, hi&0xFFFF, lo>>16, lo&0xFFFF)
    val sig = Seq(
      // pair (1,2): hamming 4, one differing bit in EACH 16-bit chunk ->
      // no shared chunk -> pigeonhole candidate generation cannot see it
      (1L, 0L, 0L),
      (2L, 0x10001L, 0x10001L),
      // pair (3,4): hamming 3 -> must share >=1 of 4 chunks -> found
      (3L, 0xFFFFFFFFL, 0xFFFFFFFFL),
      (4L, 0xFFFFFFF8L, 0xFFFFFFFFL)
    ).toDF("doc_id", "sim_hi", "sim_lo")
    val pairs = graft.operators.SimHash.pairsFromSignatures(sig, maxDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((3L, 4L, 3L)), "hamming-3 pair must be recalled")
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 2L),
      "distance-4 pair spread across all chunks is (by design) missed")
  }

  test("simhash 5-chunk mode recalls the distance-4 counterexample the " +
    "4-chunk split misses (pigeonhole: 4 bits cannot cover 5 chunks)") {
    import spark.implicits._
    // same planted signatures as the 4-chunk cap test: pair (1,2) has one
    // differing bit in each 16-bit quarter (bits 0, 16, 32, 48)
    val sig = Seq(
      (1L, 0L, 0L),
      (2L, 0x10001L, 0x10001L)
    ).toDF("doc_id", "sim_hi", "sim_lo")
    val pairs = graft.operators.SimHash
      .pairsFromSignatures(sig, maxDist = 4, chunks = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs === Set((1L, 2L, 4L)),
      "5-chunk mode must guarantee hamming<=4 recall")
  }

  test("simhash chunkRanges: covers all 64 bits exactly; n=4 is the " +
    "classic 16-bit quarters") {
    for (n <- 2 to 9) {
      val rs = graft.operators.SimHash.chunkRanges(n)
      assert(rs.map(_._2).sum === 64, s"n=$n must cover 64 bits")
      // contiguous non-overlapping from the top
      assert(rs.head._1 + rs.head._2 === 64)
      rs.sliding(2).foreach { case Seq((s1, _), (s2, l2)) =>
        assert(s1 === s2 + l2, s"n=$n chunks must tile")
      case _ => }
      assert(rs.last._1 === 0)
    }
    assert(graft.operators.SimHash.chunkRanges(4) ===
      Seq((48, 16), (32, 16), (16, 16), (0, 16)))
    assert(graft.operators.SimHash.chunkRanges(5) ===
      Seq((51, 13), (38, 13), (25, 13), (12, 13), (0, 12)))
  }

  test("leakage-safe split: no near-dup cluster ever spans two splits, " +
    "and singletons keep the plain per-doc assignment") {
    import graft.operators.Sampling
    val docs = Tables.documents(spark, sfDir)
    val labels = Dedup.clusters(
      MinHash.neardupPairs(docs, idCol = "doc_id", textCol = "text",
        threshold = 0.5))
    val withRep = docs.join(labels, Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("cluster_id"), col("doc_id")))
    val split = Sampling.assignSplit(withRep, "rep_id",
      Seq("train" -> 80, "valid" -> 10, "test" -> 10))
    // the invariant the operator exists for: 1 split per cluster
    val spanning = split.where(col("cluster_id").isNotNull)
      .groupBy("cluster_id")
      .agg(countDistinct(col("split")).as("n_splits"))
      .where(col("n_splits") > 1)
    assert(spanning.count() === 0)
    assert(labels.count() > 0, "testdata must contain near-dup clusters")
    // docs with no near-dup: rep_id == doc_id, so the assignment is
    // exactly doc_split's — mixing the two split modes stays coherent
    val plain = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 80, "valid" -> 10, "test" -> 10))
      .select(col("doc_id"), col("split").as("plain_split"))
    val singletons = split.where(col("cluster_id").isNull)
      .select("doc_id", "split").join(plain, "doc_id")
    assert(singletons.where(col("split") =!= col("plain_split")).count() === 0)
  }

  test("clusters: chains and cliques collapse to the component-min label") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), clique {7,8,9}, isolated pair {20,21}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L), (8L, 9L),
      (7L, 9L), (20L, 21L)).toDF("id_a", "id_b")
    val got = graft.operators.Dedup.clusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 20L -> 20L, 21L -> 20L))
  }

  test("clustersIncremental: prior labels + new batch == full recompute, " +
    "including cross-component merges") {
    import spark.implicits._
    // old graph: components {1,2}, {3,4}, chain {10,11,12}
    val oldPairs = Seq((1L, 2L), (3L, 4L), (10L, 11L), (11L, 12L))
      .toDF("id_a", "id_b")
    // new batch: merges {1,2} with {3,4}, extends the chain, adds a
    // brand-new component {50,51}
    val newPairs = Seq((2L, 3L), (12L, 13L), (50L, 51L))
      .toDF("id_a", "id_b")
    val prev = graft.operators.Dedup.clusters(oldPairs)
    val incr = graft.operators.Dedup.clustersIncremental(prev, newPairs)
      .as[(Long, Long)].collect().toMap
    val full = graft.operators.Dedup.clusters(oldPairs.unionAll(newPairs))
      .as[(Long, Long)].collect().toMap
    assert(incr === full)
    assert(incr(4L) === 1L && incr(13L) === 10L && incr(51L) === 50L)
  }

  test("clustersIncremental: caller-seeded singleton components survive " +
    "untouched") {
    import spark.implicits._
    // a labeling seeded over the whole corpus includes singletons
    // (self-labeled rows with no other member); the new batch touches
    // only 1-2. Singleton 99 must pass through, not vanish.
    val prev = Seq((1L, 1L), (2L, 1L), (99L, 99L)).toDF("doc_id", "cluster_id")
    val newPairs = Seq((2L, 3L)).toDF("id_a", "id_b")
    val got = graft.operators.Dedup.clustersIncremental(prev, newPairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 99L -> 99L))
  }

  test("clusters: converges on a chain deeper than any fixed pass count") {
    import spark.implicits._
    // path 100-101-...-112 (diameter 12): min-label propagation moves the
    // component minimum one hop per pass, so a fixed 8-pass loop leaves
    // the far end labeled > 100 — fixpoint iteration must fully merge it
    val chain = (100L until 112L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = graft.operators.Dedup.clusters(chain)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 13)
    assert(got.values.toSet === Set(100L), "every node must reach the component min")
  }

  test("clusters: maxIters safety bound raises instead of under-merging") {
    import spark.implicits._
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    intercept[IllegalStateException] {
      graft.operators.Dedup.clusters(chain, maxIters = 2)
    }
  }

  test("ngramJaccardPairs: blocks over maxBlock are skipped, not n²-joined") {
    import spark.implicits._
    // hot block (5 docs of identical text) over the cap of 4; cold block
    // (2 near-identical docs) under it — only the cold pair may surface
    val docs = ((1L to 5L).map(i => (i, "hot", "alpha beta gamma delta")) ++
      Seq((10L, "cold", "one two three four"),
          (11L, "cold", "one two three five"))).toDF("doc_id", "source", "text")
    val got = graft.operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", "source", n = 2, threshold = 0.1, maxBlock = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 11L)),
      "hot-block pairs must be dropped; cold-block pair must survive")
    // cap above both block sizes -> hot pairs come back (the cap is a
    // guard, not a semantic change for fine-grained keys)
    val uncapped = graft.operators.Dedup.ngramJaccardPairs(
      docs, "doc_id", "text", "source", n = 2, threshold = 0.1, maxBlock = 100)
      .count()
    assert(uncapped === 11L) // C(5,2) hot + 1 cold
  }

  test("neardupPairs: refuses a corpus larger than maxRows before pairwise work") {
    import spark.implicits._
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("emb_id", "vec")
    val ex = intercept[Exception] {
      graft.operators.Similarity.neardupPairs(
        emb, "emb_id", "vec", threshold = 0.5, maxRows = 2L).collect()
    }
    assert(ex.getMessage.contains("all-pairs") ||
      Option(ex.getCause).exists(_.getMessage.contains("all-pairs")))
    // under the cap the exact baseline still works
    val ok = graft.operators.Similarity.neardupPairs(
      emb, "emb_id", "vec", threshold = 0.5, maxRows = 10L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(ok === Set((1L, 2L)))
  }

  test("simhash signature halves stay within 32 bits") {
    val sig = graft.operators.SimHash.signature(
      Tables.documents(spark, sfDir).limit(20), "doc_id", "text")
    val bad = sig.where(
      col("sim_hi") < 0 || col("sim_hi") > 4294967295L ||
        col("sim_lo") < 0 || col("sim_lo") > 4294967295L).count()
    assert(bad === 0)
  }

  test("clustersStar: matches min-label clusters on chains, cliques, " +
    "and a seeded random graph") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 8L), (8L, 9L),
      (7L, 9L), (20L, 21L)).toDF("id_a", "id_b")
    val star = graft.operators.Dedup.clustersStar(pairs)
      .as[(Long, Long)].collect().toMap
    assert(star === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      7L -> 7L, 8L -> 7L, 9L -> 7L, 20L -> 20L, 21L -> 20L))

    val rnd = new scala.util.Random(42)
    val random = (0 until 200)
      .map(_ => (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter { case (a, b) => a != b }
      .toDF("id_a", "id_b").localCheckpoint()
    val a = graft.operators.Dedup.clusters(random)
      .as[(Long, Long)].collect().toMap
    val b = graft.operators.Dedup.clustersStar(random)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("clustersStar: a 100-node path converges in O(log d) rounds " +
    "(min-label would need ~100 passes)") {
    import spark.implicits._
    val chain = (0L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // maxIters=10 would blow up on a diameter-100 component under
    // one-hop propagation; star rounds collapse it exponentially
    val got = graft.operators.Dedup.clustersStar(chain, maxIters = 10)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 101)
    assert(got.values.toSet === Set(0L))
  }

  test("incrementalNeardupPairs: finds batch↔corpus near-dups, never " +
    "in-batch pairs") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val batch = Seq(
      (10L, base + " lambda"), // near-dup of corpus doc 1
      (20L, base + " lambda")) // also an in-batch dup of 10 — not our job
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, base + " mu"),
      (2L, "totally different words nothing shared here at all okay then"))
      .toDF("doc_id", "text")
    val got = graft.operators.MinHash.incrementalNeardupPairs(
      batch, corpus, "doc_id", "text", threshold = 0.5)
      .select("new_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 1L), (20L, 1L)))
  }

  test("tfIdfTopTerms: rare distinguishing term outranks ubiquitous ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "common common common zebra"),
      (2L, "common common other other"),
      (3L, "common filler filler filler"))
      .toDF("doc_id", "text")
    val top = graft.operators.Unigram
      .tfIdfTopTerms(docs, "doc_id", "text", 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // 'common' appears in every doc → idf 0; each doc's unique term wins
    assert(top === Map(1L -> "zebra", 2L -> "other", 3L -> "filler"))
  }

  test("clusterReps: longest member wins, min-id tiebreak, members counted") {
    import spark.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("doc_id", "cluster_id")
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c d e"), (3L, "a b c d f"), // 2 and 3 tie at 5
      (7L, "x"), (8L, "x")) // tie at 1 → min id 7
      .toDF("doc_id", "text")
    val reps = graft.operators.Dedup.clusterReps(labels, docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(reps === Set((1L, 2L, 5L, 3L), (7L, 7L, 1L, 2L)))
  }

  test("unigram logProbScores: uniform corpus scores ln(1/V) everywhere; " +
    "rare tokens lower the average") {
    import spark.implicits._
    // 4 distinct tokens, each appearing twice → p = 1/4 for all
    val uniform = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    val u = graft.operators.Unigram.logProbScores(uniform, "doc_id", "text")
      .as[(Long, Long, Double, Double)].collect()
      .map { case (id, n, avg, mn) => id -> ((n, avg, mn)) }.toMap
    val ln4 = BigDecimal(math.log(0.25)).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(u(1L) === ((4L, ln4, ln4)))
    // doc 3's singleton token is rarer than doc 4's repeated one
    val skewed = Seq((3L, "rare"), (4L, "x x x x x x x")).toDF("doc_id", "text")
    val s = graft.operators.Unigram.logProbScores(skewed, "doc_id", "text")
      .select("doc_id", "avg_logprob").as[(Long, Double)].collect().toMap
    assert(s(3L) < s(4L))
  }

  test("containmentPairs finds a planted snippet inside its source with " +
    "containment 1.0, and NOT the reverse direction") {
    import spark.implicits._
    val words = (0 until 60).map(i => s"w$i")
    val big = words.mkString(" ")
    val snippet = words.slice(10, 25).mkString(" ") // strict subset
    val other = (100 until 160).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, big), (2L, snippet), (3L, other))
      .toDF("doc_id", "text")
    val pairs = MinHash.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9)
      .select("id_a", "id_b", "containment").as[(Long, Long, Double)]
      .collect().toSet
    assert(pairs.contains((2L, 1L, 1.0)), s"snippet→source missing: $pairs")
    // big doc is NOT contained in its snippet (containment ~0.25 < 0.9)
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 2L), s"$pairs")
    // unrelated doc pairs with nothing
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), s"$pairs")
  }

  test("containmentPairs hot-shingle cap drops boilerplate-only candidates") {
    import spark.implicits._
    // 10 docs share ONE boilerplate text (every shingle df=10 > cap=5);
    // two docs share genuinely rare content
    val boiler = (0 until 20).map(_ => "same old footer text here").mkString(" ")
    val rare = (0 until 30).map(i => s"rare$i").mkString(" ")
    val docs = ((0 until 10).map(i => (i.toLong, boiler)) ++
      Seq((100L, rare), (101L, rare))).toDF("doc_id", "text")
    val pairs = MinHash.containmentPairs(docs, "doc_id", "text",
      threshold = 0.9, maxPosting = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // boilerplate candidates are capped away; the rare pair survives
    assert(pairs == Set((100L, 101L), (101L, 100L)), s"$pairs")
  }

  test("neardupPairsWithin refuses a cluster larger than maxCluster " +
    "before any pairwise work") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
      .withColumn("cluster", lit(0L)) // everything in one hot cell
    val ex = intercept[Exception] {
      Similarity.neardupPairsWithin(e, "vec_id", "embedding", "cluster",
        threshold = 0.9, maxCluster = 3).count()
    }
    assert(ex.getMessage.contains("maxCluster") ||
      Option(ex.getCause).exists(_.getMessage.contains("maxCluster")))
    // and passes untouched when the cap accommodates the cell
    val ok = Similarity.neardupPairsWithin(e, "vec_id", "embedding",
      "cluster", threshold = 0.99, maxCluster = 1000000L)
    assert(ok.count() >= 0)
  }

  test("hardNegatives never returns the probe's own label and ranks by " +
    "similarity") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sfDir)
    val out = Similarity.hardNegatives(
      e.where(col("vec_id") >= 8), e.where(col("vec_id") < 8),
      "vec_id", "embedding", "label", k = 3)
      .select("probe_id", "probe_label", "rank", "neg_label", "cos_sim")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (_, pl, _, nl, _) => assert(pl != nl) }
    out.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._3).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
