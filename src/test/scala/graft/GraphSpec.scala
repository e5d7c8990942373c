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
}
