package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting (the node-iterator++ / degree-oriented
  * scheme of Suri & Vassilvitskii 2011) — the graph statistic BESIDE
  * connected components (C29): a duplication family that is clique-y
  * (every copy matches every other — triangles everywhere) needs one
  * representative kept; a star/chain family (hub template page) needs
  * per-edge review. Per-node triangle participation is the signal.
  *
  * Scale shape: edges orient from the LOWER-degree endpoint to the
  * higher (ties by id), so every wedge is generated exactly once at its
  * lowest-degree vertex and a degree-d hub generates O(d_low²) wedges
  * instead of O(d²) — the standard skew-killer for power-law graphs.
  * The count is then wedge ⋈ edge: two shuffles on edge keys, no
  * vertex ever holds its full neighborhood in one row.
  *
  * Determinism: pure integer degree/id comparisons; counts exact longs.
  */
object Graph {

  /** (n_nodes, n_edges, n_triangles) one-row summary plus per-node
    * participation via `triangleCounts`. Input: undirected edge list
    * with columns (a, b), a < b, no duplicates. */
  def triangles(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient each edge from lower (degree, id) to higher
    val e = edges
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(col("da") < col("db")
          || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("o"))
      .select(col("o.src"), col("o.dst"))
    // wedges at the low vertex: (src, d1, d2) with d1 < d2 (id order —
    // wedge closure checks the UNDIRECTED edge, canonicalized a < b)
    val w = e.as("e1").join(e.as("e2"), col("e1.src") === col("e2.src")
        && col("e1.dst") < col("e2.dst"))
      .select(least(col("e1.dst"), col("e2.dst")).as("wa"),
        greatest(col("e1.dst"), col("e2.dst")).as("wb"))
    w.join(edges, col("wa") === col("a") && col("wb") === col("b"))
      .agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(
        edges.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  /** DuckDB mirror over an `edges(a, b)` relation (a < b, distinct):
    * the direct three-way join — parity proves the oriented wedge plan
    * counts every triangle exactly once. */
  def trianglesSql(edgesRel: String): String =
    s"""SELECT
       |  (SELECT count(*) FROM (SELECT a AS v FROM $edgesRel
       |      UNION SELECT b FROM $edgesRel)) AS n_nodes,
       |  (SELECT count(*) FROM $edgesRel) AS n_edges,
       |  (SELECT count(*) FROM $edgesRel e1
       |     JOIN $edgesRel e2 ON e2.a = e1.a AND e2.b > e1.b
       |     JOIN $edgesRel e3 ON e3.a = e1.b AND e3.b = e2.b) AS n_triangles""".stripMargin
}
