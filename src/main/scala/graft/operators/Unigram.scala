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
