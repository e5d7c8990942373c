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
    // Materialize the edge list ONCE (guide §2.4 — the Dedup.clusters
    // discipline): this plan consumes `edges` seven times (degree
    // census twice, orientation join, wedge closure, edge/node
    // counts), and each consumption re-inlined the caller's whole
    // edge-derivation pipeline — doc_dup_triangles re-ran the full
    // MinHash shingle→band→Jaccard subtree ~28× (1748-line plan, 56
    // document scans). Edge lists here are collision-bounded pair
    // sets, orders of magnitude smaller than the corpus, so the
    // materialization is the same bounded-intermediate call as the
    // cluster fixpoint's. Executor loss ⇒ job fails and the re-run
    // recomputes — acceptable for a bounded derived frame.
    val ed = edges.localCheckpoint()
    val deg = ed.select(col("a").as("v"))
      .unionAll(ed.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
      .localCheckpoint() // three consumers: two orientation joins + count
    // orient each edge from lower (degree, id) to higher
    val e = ed
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
    w.join(ed, col("wa") === col("a") && col("wb") === col("b"))
      .agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(
        ed.agg(count(lit(1)).as("n_edges"))))
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

  /** Weighted PageRank over a directed edge list, FIXED `iters` power
    * iterations in exact integer fixed-point — the provenance-centrality
    * signal for crawl curation (which sources ORIGINATE content vs
    * mirror it; Page et al. 1999, the curation use echoing CommonCrawl's
    * harmonic-centrality source ranking).
    *
    * Determinism (the C18/C83 bounded-iteration discipline): rank state
    * is an e12-scaled long (start = 1e12 per node); each edge routes
    * `rank·w DIV W_out` (decimal(38,0) product, integral division);
    * dangling mass (nodes with no out-edges) is redistributed uniformly
    * as `DIV n`; the damped update is
    * `base + dampE6·(in + share) DIV 1e6` with
    * `base = (1e6−dampE6)·1e6`. Every operand is a non-negative
    * integer, so Spark's truncating `div` and DuckDB's flooring `//`
    * agree, and the whole loop is replayable as unrolled CTEs
    * ([[pagerankSql]]). Truncation sheds ≤1e-12 mass per edge per
    * round — deterministic on both engines, irrelevant to ranking.
    *
    * Scale shape: one iteration = edges ⋈ ranks on src (the O(|E|)
    * equi-join shuffle) + groupBy(dst); rank/out-weight sides are
    * O(|V|). The two scalar terms (dangling mass, node count) are 1-row
    * broadcasts. Each iteration is materialized (localCheckpoint) —
    * exactly how a web-scale PR run checkpoints rounds instead of
    * growing one 3·d-deep plan. State bound: ranks sum to ≤ |V|·1e12,
    * so per-node longs hold to |V| < 9.2e6 per *connected mass* — at
    * larger |V| the same loop runs with a smaller scale constant.
    *
    * @param nodes one column `v` (the full vertex set — isolated
    *              vertices keep base rank and receive dangling share)
    * @param edges (src, dst, w) with positive long weights
    * @return (v, rank_e12) */
  def pagerank(nodes: DataFrame, edges: DataFrame, iters: Int,
               dampE6: Long = 850000L): DataFrame = {
    require(iters >= 1 && dampE6 >= 0 && dampE6 <= 1000000L)
    val spark = nodes.sparkSession
    val baseE12 = (1000000L - dampE6) * 1000000L
    val outW = edges.groupBy("src").agg(sum(col("w")).as("wout"))
      .localCheckpoint()
    val nNodes = nodes.agg(count(lit(1)).as("n"))
    var ranks = nodes.select(col("v"), lit(1000000000000L).as("rank"))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      val contrib = edges.join(ranks.withColumnRenamed("v", "src"), "src")
        .join(outW, "src")
        .select(col("dst").as("v"),
          expr("CAST(rank AS DECIMAL(38,0)) * CAST(w AS DECIMAL(38,0))" +
            " div CAST(wout AS DECIMAL(38,0))").as("c"))
      val inSum = contrib.groupBy("v").agg(sum(col("c")).as("insum"))
      val dangling = ranks.join(outW.withColumnRenamed("src", "v"),
          Seq("v"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
        .crossJoin(broadcast(nNodes))
        .select(expr("CAST(dmass AS DECIMAL(38,0)) div CAST(n AS DECIMAL(38,0))")
          .as("share"))
      ranks = nodes
        .join(inSum, Seq("v"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("v"),
          (lit(baseE12) + expr(
            s"CAST($dampE6 AS DECIMAL(38,0)) * " +
              "(coalesce(insum, 0) + share) div CAST(1000000 AS DECIMAL(38,0))"))
            .cast("long").as("rank"))
        .localCheckpoint()
    }
    ranks.select(col("v"), col("rank").as("rank_e12"))
  }

  /** DuckDB mirror of [[pagerank]] as unrolled per-iteration CTEs.
    * `prefixCtes` must define relations `nodes(v)` and
    * `edges(src, dst, w)`; the caller appends its own final SELECT over
    * the returned query's (v, rank_e12) output. */
  def pagerankSql(prefixCtes: String, iters: Int,
                  dampE6: Long = 850000L): String = {
    val baseE12 = (1000000L - dampE6) * 1000000L
    val steps = (1 to iters).map { i =>
      s"""c$i AS (
         |  SELECT e.dst AS v,
         |         CAST(r.rank AS HUGEINT) * e.w // o.wout AS c
         |  FROM edges e
         |  JOIN r${i - 1} r ON r.v = e.src
         |  JOIN outw o ON o.src = e.src),
         |s$i AS (SELECT v, sum(c) AS insum FROM c$i GROUP BY 1),
         |d$i AS (
         |  SELECT COALESCE(sum(r.rank), 0) // (SELECT n FROM nn) AS share
         |  FROM r${i - 1} r LEFT JOIN outw o ON o.src = r.v
         |  WHERE o.src IS NULL),
         |r$i AS (
         |  SELECT nodes.v,
         |         $baseE12 + CAST($dampE6 AS HUGEINT)
         |           * (COALESCE(s$i.insum, 0) + d$i.share) // 1000000 AS rank
         |  FROM nodes LEFT JOIN s$i ON s$i.v = nodes.v CROSS JOIN d$i)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $prefixCtes,
       |outw AS (SELECT src, sum(w) AS wout FROM edges GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT v, CAST(1000000000000 AS HUGEINT) AS rank FROM nodes),
       |$steps
       |SELECT v, CAST(rank AS BIGINT) AS rank_e12 FROM r$iters""".stripMargin
  }
}
