package graft

import graft.operators.Graph

/** Triangle-census contracts: exact counts on planted shapes and
  * agreement with the brute-force three-way join on a random graph. */
class GraphSpec extends SparkSpec {

  private def edgesDf(es: (Long, Long)*) = {
    import spark.implicits._
    es.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .distinct.toDF("a", "b")
  }

  test("planted shapes: K4 has 4 triangles, a star and a chain have none") {
    // K4 on {1,2,3,4}
    val k4 = edgesDf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val r = Graph.triangles(k4).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 6L, 4L)))
    // star: hub 1 → leaves 2..6 (high-degree hub, zero triangles)
    val star = edgesDf((2L to 6L).map(l => (1L, l)): _*)
    assert(Graph.triangles(star).collect().head.getLong(2) === 0L)
    // chain 1-2-3-4-5
    val chain = edgesDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(Graph.triangles(chain).collect().head.getLong(2) === 0L)
  }

  test("random graph: oriented wedge count == brute-force three-way join") {
    // deterministic pseudo-random edges over 30 nodes
    val es = for {
      a <- 1L to 30L; b <- (a + 1) to 30L
      if (a * 7919 + b * 104729) % 5 == 0
    } yield (a, b)
    val df = edgesDf(es: _*)
    val got = Graph.triangles(df).collect().head.getLong(2)
    val set = es.toSet
    val want = (for {
      (a, b) <- es; c <- (b + 1) to 30L
      if set.contains((a, c)) && set.contains((b, c))
    } yield 1).size.toLong
    assert(got === want)
    assert(want > 0L, "degenerate test: no triangles planted")
  }

  test("pagerank: symmetric cycle keeps every rank at exactly 1e12") {
    import spark.implicits._
    // 3-cycle, unit weights: contrib = rank div 1 = rank, no dangling,
    // so each round computes 1.5e11 + 850000*1e12 div 1e6 = 1e12 exactly
    val nodes = Seq(1L, 2L, 3L).toDF("v")
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val r = Graph.pagerank(nodes, edges, iters = 3).collect()
    assert(r.length === 3)
    r.foreach(row => assert(row.getLong(1) === 1000000000000L))
  }

  test("pagerank: matches an integer reference loop (dangling + isolated)") {
    import spark.implicits._
    // weighted digraph with a dangling hub (4 has no out-edges) and an
    // isolated node (5): leaves feed the hub, hub mass redistributes
    val es = Seq((1L, 4L, 3L), (2L, 4L, 1L), (3L, 4L, 2L), (1L, 2L, 1L))
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("v")
    val got = Graph.pagerank(nodes, es.toDF("src", "dst", "w"), iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // reference: the same exact integer recurrence, scalar-side
    val outW = es.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    var rank = Map(1L -> 1000000000000L, 2L -> 1000000000000L,
      3L -> 1000000000000L, 4L -> 1000000000000L, 5L -> 1000000000000L)
    (1 to 3).foreach { _ =>
      val in = es.groupBy(_._2).map { case (d, g) =>
        d -> g.map { case (s, _, w) =>
          (BigInt(rank(s)) * w / outW(s)).toLong }.sum }
      val dang = rank.keys.toSeq.filterNot(outW.contains).map(rank).sum / 5
      rank = rank.keys.toSeq.map { v =>
        v -> (150000000000L +
          (BigInt(850000L) * (in.getOrElse(v, 0L) + dang) / 1000000L).toLong)
      }.toMap
    }
    assert(got === rank)
    // hub outranks everything; isolated node gets base + dangling share
    assert(got(4L) > got(1L) && got(1L) > 0L)
  }
}
