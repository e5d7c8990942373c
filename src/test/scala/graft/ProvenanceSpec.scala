package graft

import org.apache.spark.sql.functions._

import graft.operators.Provenance

/** Cross-source duplication matrix (C67): planted overlaps come out
  * exactly, within-source duplicates collapse before the pair stage,
  * zero-overlap pairs are absent, and Jaccard is the exact set ratio. */
class ProvenanceSpec extends SparkSpec {

  test("sourceOverlap counts distinct shared contents per pair") {
    import spark.implicits._
    // A: {x, y, z} ; B: {x, y, w} ; C: {z} ; D: {q} (no overlap).
    // 'x' appears TWICE in A (must collapse to one distinct content).
    val df = Seq(
      ("A", "x"), ("A", "x"), ("A", "y"), ("A", "z"),
      ("B", "x"), ("B", "y"), ("B", "w"),
      ("C", "z"), ("D", "q")).toDF("source", "text")
    val out = Provenance.sourceOverlap(df, "source", "text")
      .orderBy("source_a", "source_b").collect()
    val rows = out.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.toSeq == Seq(
      ("A", "B", 2L, 3L, 3L, 0.5),    // {x,y} / {x,y,z,w}
      ("A", "C", 1L, 3L, 1L, 0.3333)))  // round(1/3, 4)
    // D shares nothing -> absent; pairs are a < b ordered once.
    assert(!rows.exists(r => r._1 == "D" || r._2 == "D"))
  }

  test("doc_source_overlap planted copies produce symmetric-free pairs") {
    val out = graft.queries.Docs.queries("doc_source_overlap")(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every pair ordered a < b, shared >= 1, jaccard in (0, 1]
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      assert(r.getLong(2) >= 1L)
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
    }
  }
}
