package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 ranked retrieval over a document corpus — the classic lexical
  * relevance scorer (Robertson/Spärck Jones; the `k1`/`b` form every
  * search engine ships). In a training-data pipeline this is the
  * "find corpus documents most related to these probe texts" primitive:
  * targeted decontamination sweeps, curriculum mining near eval tasks,
  * and cheap retrieval baselines to sanity-check embedding ANN results.
  *
  * Scale shape (the 100 TB story): one corpus tokenize →
  * `groupBy(doc, term)` tf (partial-agg shuffle), one `groupBy(doc)`
  * doc-length (same), then the corpus-sized side is immediately PRUNED
  * by a broadcast semi-join against the (tiny) distinct query-term set
  * — df, idf, and scoring only ever touch postings of queried terms,
  * never the full vocabulary. Per-(query, doc) scores are one more
  * combine-friendly shuffle, and the final top-k is a window
  * PARTITIONED by query that Spark rewrites to a partial top-k
  * (InferWindowGroupLimit), so no full sort survives. In a standing
  * deployment the (doc, term, tf) + (doc, dl) frames are the posting
  * index you materialize once (bucketed by term) and reuse per query
  * batch; block-max/WAND pruning is the known upgrade if query volume
  * grows — the output contract here wouldn't change.
  *
  * Cross-engine determinism: idf (the only transcendental) is
  * `round(ln(...), 9)` per term; each term's contribution is again
  * rounded to 9 places; per-document scores sum those contributions as
  * scaled-e9 DECIMAL(38,0) (order-independent exact integer sum, the
  * SURVEY §6 `sumFixed` discipline) and the output is `score_e9`
  * BIGINT with a doc-id tiebreak on the rank cut. */
object Bm25 {

  /** Top-`k` documents per probe query by BM25. `queries` is a small
    * in-memory (qid, text) set — it broadcasts; repeated terms within
    * one query are collapsed (standard for short probe queries).
    * Output: (qid, rank, docId, n_terms, score_e9), rank 1..k dense
    * per qid, score_e9 = BM25 × 10⁹ as exact BIGINT. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           queries: Seq[(String, String)], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    import spark.implicits._

    require(queries.nonEmpty && queries.exists(_._2.trim.nonEmpty),
      "BM25 needs at least one non-empty probe query")
    val qterms = queries.flatMap { case (qid, qt) =>
      qt.split(' ').filter(_.nonEmpty).distinct.map(t => (qid, t))
    }.toDF("qid", "term")
    val qtermSet = qterms.select("term").distinct()

    val toks = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("term"))
    // (doc, term, tf) is the posting index — pinned once so dl, df and
    // scoring all derive from ONE corpus tokenize (the standing-
    // deployment analogue: materialize this bucketed by term).
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf")).localCheckpoint()
    // Query-term postings only, from here on — tiny vs the corpus.
    val postings = tf.join(broadcast(qtermSet), "term")
    val dfT = postings.groupBy("term").agg(count(lit(1)).as("df"))
    // Doc lengths for ALL docs (avgdl needs the full corpus), but the
    // scoring join only pulls the matched docs' rows.
    val dl = tf.groupBy(col(idCol)).agg(sum("tf").as("dl"))
    // avgdl via exact integer sum ÷ count (one IEEE division), NOT
    // avg(): engine-order double accumulation could drift an ulp.
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl").cast("decimal(38,0)")).cast("double") /
        count(lit(1))).as("avgdl"))

    val idf9 = round(log(
      (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 9)
    val tfNorm = col("tf").cast("double") * (k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") / col("avgdl")))
    val contrib9: Column = round(idf9 * tfNorm, 9)

    val w = Window.partitionBy(col("qid"))
      .orderBy(desc("score_e9"), col(idCol))
    postings
      .join(broadcast(qterms), "term")
      .join(broadcast(dfT), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .groupBy(col("qid"), col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        sum((contrib9 * 1e9).cast("decimal(38,0)")).cast("long")
          .as("score_e9"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col(idCol), col("n_terms"), col("score_e9"))
  }

  /** Reciprocal-rank fusion of a retrieval ranking with a second
    * per-document signal — the standard rerank when two rankings have
    * incomparable score scales (BM25 relevance vs a quality/centrality
    * prior): fused = 1/(c + rank₁) + 1/(c + rank₂), c = 60 per the RRF
    * paper (Cormack et al. 2009). Ranks are INTEGERS, so the only
    * doubles are two small-int divisions summed in a fixed order,
    * rounded e9 and stored as exact BIGINT — engine-exact like the
    * BM25 score ladder.
    *
    * `hits` is a [[topK]]-shaped frame (qid, rank, id, …) —
    * |queries|·k rows, broadcast into the join against the
    * corpus-sized `scores` (id, score) frame, which is probed, never
    * shuffled. The second ranking is computed AMONG each query's
    * candidates (k-row windows), which is what a reranker sees. */
  def rrfRerank(hits: DataFrame, scores: DataFrame, idCol: String,
                c: Int = 60): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = scores.join(broadcast(hits), idCol)
    val wq = Window.partitionBy(col("qid"))
      .orderBy(desc("score"), col(idCol))
    val wf = Window.partitionBy(col("qid"))
      .orderBy(desc("rrf_e9"), col(idCol))
    cand
      .withColumn("q_rank", row_number().over(wq).cast("long"))
      .withColumn("rrf_e9",
        (round(lit(1.0) / (lit(c.toDouble) + col("rank"))
          + lit(1.0) / (lit(c.toDouble) + col("q_rank")), 9) * 1e9)
          .cast("decimal(38,0)").cast("long"))
      .withColumn("fused_rank", row_number().over(wf).cast("long"))
      .select(col("qid"), col("fused_rank"), col(idCol),
        col("rank").as("bm25_rank"), col("q_rank"), col("rrf_e9"))
  }

  /** DuckDB mirror of [[rrfRerank]] over [[topKSql]]'s output shape:
    * `hitsSql` must yield (qid, rank, id, …); `scoreExpr` is the
    * second signal computed per document of `table`. */
  /** Retrieval self-evaluation — the ANN recall-report discipline (C74)
    * applied to lexical retrieval: grade [[topK]]'s ranking against an
    * EXACT relevance oracle. Relevance is binary and label-free: a
    * document is relevant to a query iff it contains ≥ `minMatch`
    * DISTINCT query terms — fully replayable in SQL, which is what lets
    * the driver certify the metrics rather than trust them. Metrics per
    * query: corpus-wide `n_relevant`, `n_hits` inside the top-k,
    * `recall_e4` / `precision_e4` / `mrr_e4` as exact e4 integers (pure
    * integer divisions — no engine-native float ranking metrics, no
    * log-discount transcendentals to diverge), and `first_rank`.
    * Queries with no relevant documents or no relevant hits surface as
    * NULL metrics, not dropped rows (the C74 zero-result-visibility
    * rule).
    *
    * Scale shape: the relevance side touches only query-term postings
    * (broadcast semi-join against the tiny term set — the same pruning
    * [[topK]] does); the metric aggregation runs on |queries|·k rows. */
  def evalTopK(docs: DataFrame, idCol: String, textCol: String,
               queries: Seq[(String, String)], k: Int,
               minMatch: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hits = topK(docs, idCol, textCol, queries, k)
    val qterms = queries.flatMap { case (qid, qt) =>
      qt.split(' ').filter(_.nonEmpty).distinct.map(t => (qid, t))
    }.toDF("qid", "term")
    // relevant(q, d): d carries >= minMatch distinct terms of q —
    // distinct (doc, term) first, so tf never inflates the match count
    val rel = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
      .distinct()
      .join(broadcast(qterms), "term")
      .groupBy(col("qid"), col(idCol))
      .agg(count(lit(1)).as("n_match"))
      .where(col("n_match") >= minMatch)
      .select(col("qid"), col(idCol), lit(1L).as("__rel"))
      .localCheckpoint() // consumed by relCnt and the hit join
    val relCnt = rel.groupBy("qid").agg(count(lit(1)).as("n_relevant"))
    val hitAgg = hits
      .join(rel, Seq("qid", idCol), "left")
      .groupBy(col("qid"))
      .agg(sum(coalesce(col("__rel"), lit(0L))).as("n_hits"),
        min(when(col("__rel") === 1L, col("rank"))).as("first_rank"))
    val spine = queries.map(_._1).toDF("qid")
    spine
      .join(hitAgg, Seq("qid"), "left")
      .join(relCnt, Seq("qid"), "left")
      .select(col("qid"),
        coalesce(col("n_relevant"), lit(0L)).as("n_relevant"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("first_rank"))
      .select(col("qid"), col("n_relevant"), col("n_hits"),
        when(col("n_relevant") > 0,
          expr("(10000 * n_hits) div n_relevant")).as("recall_e4"),
        expr(s"(10000 * n_hits) div $k").as("precision_e4"),
        col("first_rank"),
        when(col("first_rank").isNotNull,
          expr("10000 div first_rank")).as("mrr_e4"))
  }

  /** DuckDB mirror of [[evalTopK]] — [[topKSql]] as the hits CTE, the
    * identical distinct-term relevance oracle, and the same integer
    * metric ladders (`//` == Spark `div` on the non-negative operands). */
  def evalTopKSql(table: String, id: String, text: String,
                  queries: Seq[(String, String)], k: Int,
                  minMatch: Int = 2): String = {
    val qvals = queries.flatMap { case (qid, qt) =>
      qt.split(' ').filter(_.nonEmpty).distinct
        .map(t => s"('${sqlLit(qid)}', '${sqlLit(t)}')")
    }.mkString(", ")
    s"""WITH hits AS (SELECT * FROM (${topKSql(table, id, text, queries, k)}) tk),
       |qt(qid, term) AS (VALUES $qvals),
       |dterm AS (
       |  SELECT DISTINCT $id, term FROM (
       |    SELECT $id, unnest(string_split($text, ' ')) AS term
       |    FROM $table) u),
       |rel AS (
       |  SELECT qid, $id FROM dterm JOIN qt USING (term)
       |  GROUP BY 1, 2 HAVING count(*) >= $minMatch),
       |relcnt AS (SELECT qid, count(*) AS n_relevant FROM rel GROUP BY 1),
       |hagg AS (
       |  SELECT h.qid,
       |    sum(CASE WHEN r.$id IS NOT NULL THEN 1 ELSE 0 END) AS n_hits,
       |    min(CASE WHEN r.$id IS NOT NULL THEN h.rank END) AS first_rank
       |  FROM hits h LEFT JOIN rel r ON h.qid = r.qid AND h.$id = r.$id
       |  GROUP BY 1),
       |m AS (
       |  SELECT q.qid,
       |    coalesce(n_relevant, 0) AS n_relevant,
       |    coalesce(n_hits, 0) AS n_hits,
       |    first_rank
       |  FROM (SELECT DISTINCT qid FROM qt) q
       |  LEFT JOIN hagg USING (qid) LEFT JOIN relcnt USING (qid))
       |SELECT qid, CAST(n_relevant AS BIGINT) AS n_relevant,
       |  CAST(n_hits AS BIGINT) AS n_hits,
       |  CASE WHEN n_relevant > 0
       |       THEN CAST((10000 * n_hits) // n_relevant AS BIGINT)
       |  END AS recall_e4,
       |  CAST((10000 * n_hits) // $k AS BIGINT) AS precision_e4,
       |  CAST(first_rank AS BIGINT) AS first_rank,
       |  CASE WHEN first_rank IS NOT NULL
       |       THEN CAST(10000 // first_rank AS BIGINT)
       |  END AS mrr_e4
       |FROM m""".stripMargin
  }

  def rrfRerankSql(hitsSql: String, table: String, id: String,
                   scoreExpr: String, c: Int = 60): String =
    s"""WITH b AS (SELECT * FROM ($hitsSql) tk),
       |qs AS (SELECT $id, $scoreExpr AS score FROM $table),
       |j AS (SELECT b.qid, b.rank, b.$id, qs.score
       |      FROM b JOIN qs USING ($id)),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY qid
       |      ORDER BY score DESC, $id) AS q_rank
       |  FROM j),
       |f AS (
       |  SELECT qid, $id, rank AS bm25_rank, q_rank,
       |    CAST(CAST(round(1.0 / ($c + rank) + 1.0 / ($c + q_rank), 9)
       |      * 1e9 AS DECIMAL(38,0)) AS BIGINT) AS rrf_e9
       |  FROM r)
       |SELECT qid,
       |  row_number() OVER (PARTITION BY qid
       |    ORDER BY rrf_e9 DESC, $id) AS fused_rank,
       |  $id, bm25_rank, q_rank, rrf_e9
       |FROM f""".stripMargin

  /** DuckDB mirror of [[topK]] — same query set, same round(9) ladder,
    * same scaled-e9 integer sum, same doc-id tiebreak. */
  /** SQL string-literal escape for interpolated query ids/terms: the
    * API takes arbitrary Seq[(String,String)], so a term containing a
    * single quote must not break (or inject into) the generated oracle
    * SQL. Doubling quotes is the one escape both engines share. */
  private def sqlLit(s: String): String = s.replace("'", "''")

  def topKSql(table: String, id: String, text: String,
              queries: Seq[(String, String)], k: Int,
              k1: Double = 1.2, b: Double = 0.75): String = {
    val qvals = queries.flatMap { case (qid, qt) =>
      qt.split(' ').filter(_.nonEmpty).distinct
        .map(t => s"('${sqlLit(qid)}', '${sqlLit(t)}')")
    }.mkString(", ")
    require(qvals.nonEmpty,
      "BM25 oracle needs at least one non-empty probe query" +
        " (an empty VALUES list is a SQL syntax error, not an empty result)")
    s"""WITH qterms(qid, term) AS (VALUES $qvals),
       |toks AS (
       |  SELECT $id, unnest(string_split($text, ' ')) AS term
       |  FROM $table),
       |tf AS (SELECT $id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
       |postings AS (
       |  SELECT tf.* FROM tf
       |  WHERE term IN (SELECT DISTINCT term FROM qterms)),
       |dfx AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
       |dl AS (SELECT $id, sum(tf) AS dl FROM tf GROUP BY 1),
       |stats AS (
       |  SELECT count(*) AS n_docs,
       |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
       |contrib AS (
       |  SELECT q.qid, p.$id,
       |    round(round(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0), 9)
       |      * (p.tf * ${k1 + 1.0} /
       |         (p.tf + $k1 * (${1.0 - b} + $b * d.dl / avgdl))),
       |      9) AS c9
       |  FROM postings p
       |  JOIN qterms q USING (term)
       |  JOIN dfx USING (term)
       |  JOIN dl d USING ($id), stats),
       |scored AS (
       |  SELECT qid, $id, count(*) AS n_terms,
       |    CAST(sum(CAST(c9 * 1e9 AS DECIMAL(38,0))) AS BIGINT)
       |      AS score_e9
       |  FROM contrib GROUP BY 1, 2),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |      PARTITION BY qid ORDER BY score_e9 DESC, $id) AS rank
       |  FROM scored)
       |SELECT qid, rank, $id, n_terms, score_e9
       |FROM ranked WHERE rank <= $k""".stripMargin
  }
}
