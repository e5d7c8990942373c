package graft

import graft.operators.Fuzzy

/** C90 blocking contracts: every edit-type at distance 1 is found,
  * distance-2 pairs are not, and multi-key collisions dedup. */
class FuzzySpec extends SparkSpec {

  private lazy val names = {
    import spark.implicits._
    Seq(
      (1L, "spark"),   // base
      (2L, "spork"),   // substitution of base
      (3L, "sparks"),  // insertion vs base
      (4L, "spar"),    // deletion vs base
      (5L, "spoon"),   // distance > 1 from all of the above
      (6L, "spark"),   // exact duplicate of base
      (7L, ""),        // empty string edge
      (8L, "a"))       // one insertion from empty
      .toDF("id", "name")
  }

  test("finds substitution, insertion, deletion, equality; rejects d>1") {
    val got = Fuzzy.editDistance1Pairs(names, "id", "name")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set(
      (1L, 2L), (1L, 3L), (1L, 4L), (1L, 6L), // sub, ins, del, equal
      (2L, 6L), (3L, 6L), (4L, 6L),           // via the duplicate
      (7L, 8L))                               // empty + one char
    assert(got === want)
  }

  test("pairs are emitted once despite multiple shared deletion keys") {
    import spark.implicits._
    // "aa" vs "aa": identity + both single deletions collide (3 keys)
    val df = Seq((1L, "aa"), (2L, "aa")).toDF("id", "name")
    assert(Fuzzy.editDistance1Pairs(df, "id", "name").count() === 1L)
  }
}
