package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus unigram language model and per-document log-probability
  * scoring — the classic "how surprising is this document under the
  * corpus's own token distribution" quality signal (CCNet-style; docs
  * full of rare junk tokens score low, boilerplate scores high).
  *
  * Scale shape: two corpus scans and two shuffles, both the standard
  * partial-agg-friendly kind — (1) explode tokens → groupBy(token)
  * count (map-side combine collapses each partition to its distinct
  * tokens before the exchange), (2) re-explode and equi-join tokens
  * against the vocab on the token key, then groupBy(doc) — a
  * shuffle-join on a hot-keyed but combine-friendly column. The 1-row
  * corpus total joins as a broadcast; nothing ever collects to the
  * driver. For a skew-free 100 TB variant, cap the vocab to top-K
  * tokens + one OOV smoothing bucket and broadcast it instead of the
  * shuffle join — same output contract.
  *
  * Cross-engine determinism: per-token log-probs are rounded to 9
  * places BEFORE the per-doc average (a ≤1-ulp `ln` difference between
  * JVM and libm cannot survive both round(9) and the final round(4)),
  * and token counts are exact longs. */
object Unigram {

  /** Per-document unigram score: (idCol, n_tokens, avg_logprob,
    * min_logprob) where logprob(t) = ln(count(t) / corpus_tokens). */
  def logProbScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(split(col(textCol), " ")).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // the total re-reads it; don't re-run the corpus agg
    val total = vocab.agg(sum(col("cnt")).as("corpus_toks"))
    val lp = round(log(col("cnt").cast("double") / col("corpus_toks")), 9)
    toks
      .join(vocab, "tok")
      .crossJoin(broadcast(total))
      .select(col(idCol), lp.as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("lp")), 4).as("avg_logprob"),
        round(min(col("lp")), 4).as("min_logprob"))
  }

  /** Top-`k` characteristic terms per document by tf·idf — the classic
    * "what is this document about" signal (and the cheap keyword-index
    * builder for corpus exploration). tf = in-doc term count, idf =
    * ln(N / df); scores rounded to 9 places before ranking (same
    * cross-engine ladder as [[logProbScores]]) with a term-name
    * tiebreak so the top-k cut is deterministic.
    *
    * Scale shape: (doc, term, tf) and (term, df) are both one
    * partial-agg shuffle; the join is on the term key; the top-k pick
    * is a window PARTITIONED by doc (docs ≫ cores) that Spark rewrites
    * to a partial top-k (InferWindowGroupLimit), so no full per-doc
    * sort survives. N joins as a broadcast 1-row count. */
  def tfIdfTopTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs
      .select(col(idCol), explode(split(col(textCol), " ")).as("term"))
    val tf = terms.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("term"))
      .agg(countDistinct(col(idCol)).as("df_docs"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val score = round(col("tf") *
      log(col("__n").cast("double") / col("df_docs")), 9)
    val w = Window.partitionBy(col(idCol))
      .orderBy(desc("__score"), col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("__score", score)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df_docs"),
        round(col("__score"), 4).as("tfidf"))
  }

  /** DuckDB mirror of [[tfIdfTopTerms]] (same score ladder, same
    * tiebreak). */
  def tfIdfTopTermsSql(table: String, id: String, text: String,
                       k: Int): String =
    s"""WITH terms AS (
       |  SELECT $id, unnest(string_split($text, ' ')) AS term FROM $table),
       |tf AS (SELECT $id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
       |dfx AS (SELECT term, count(DISTINCT $id) AS df_docs
       |        FROM terms GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM $table),
       |scored AS (
       |  SELECT $id, term, tf, df_docs,
       |         round(tf * ln(n_docs / df_docs), 9) AS score
       |  FROM tf JOIN dfx USING (term), n),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |      PARTITION BY $id ORDER BY score DESC, term) AS rn
       |  FROM scored)
       |SELECT $id, term, tf, df_docs, round(score, 4) AS tfidf
       |FROM ranked WHERE rn <= $k""".stripMargin

  /** DuckDB mirror of [[logProbScores]] (same rounding ladder). */
  def logProbScoresSql(table: String, id: String, text: String): String =
    s"""WITH toks AS (
       |  SELECT $id, unnest(string_split($text, ' ')) AS tok FROM $table),
       |vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
       |total AS (SELECT sum(cnt) AS corpus_toks FROM vocab),
       |lp AS (
       |  SELECT $id, round(ln(cnt / corpus_toks), 9) AS lp
       |  FROM toks JOIN vocab USING (tok), total)
       |SELECT $id, count(*) AS n_tokens,
       |       round(avg(lp), 4) AS avg_logprob,
       |       round(min(lp), 4) AS min_logprob
       |FROM lp GROUP BY 1""".stripMargin
}
