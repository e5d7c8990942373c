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

  /** Per-stratum LM-score deciles — the "perplexity bucket" report every
    * mixture recipe starts from (CCNet buckets CommonCrawl by LM
    * perplexity into head/middle/tail; this is the 10-bucket per-source
    * generalization over [[logProbScores]]). Docs rank within their
    * stratum by (avg_logprob, id) — the id tiebreak makes the ntile cut
    * a total order, so both engines assign identical buckets — and each
    * (stratum, decile) row reports how many docs/tokens it holds and its
    * score range, i.e. exactly the table you consult to decide "train on
    * deciles 1-7 of web, all of books".
    *
    * Scale shape: [[logProbScores]]'s two combine-friendly shuffles, a
    * stratum equi-join (doc-keyed, 1:1), then ONE window partitioned by
    * stratum. Strata ≪ docs makes the window the only skew point: a
    * single giant source serializes its rank into one reducer. That is
    * inherent to exact global ntile; the 100 TB relaxation is the
    * histogram-percentile trick (B45) — bucket avg_logprob to a fixed
    * grid and cut deciles from cumulative bucket counts, trading exact
    * decile boundaries for bounded state. Exact form kept here because
    * the output contract (every doc in exactly one decile) is what the
    * downstream sampler consumes. */
  def logProbDeciles(docs: DataFrame, idCol: String, textCol: String,
                     stratumCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scores = logProbScores(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(stratumCol).as("stratum")), idCol)
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("avg_logprob"), col(idCol))
    scores
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("stratum"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        round(min(col("avg_logprob")), 4).as("lp_min"),
        round(max(col("avg_logprob")), 4).as("lp_max"))
  }

  /** DuckDB mirror of [[logProbDeciles]] (same tiebreak, same ladder). */
  def logProbDecilesSql(table: String, id: String, text: String,
                        stratum: String): String =
    s"""WITH scores AS (${logProbScoresSql(table, id, text)}),
       |j AS (
       |  SELECT s.*, d.$stratum AS stratum
       |  FROM scores s JOIN $table d USING ($id)),
       |b AS (
       |  SELECT *, ntile(10) OVER (
       |      PARTITION BY stratum ORDER BY avg_logprob, $id) AS decile
       |  FROM j)
       |SELECT stratum, decile, count(*) AS n_docs,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |       round(min(avg_logprob), 4) AS lp_min,
       |       round(max(avg_logprob), 4) AS lp_max
       |FROM b GROUP BY 1, 2""".stripMargin

  /** Per-stratum Zipf fit — the distributional health check run before
    * trusting a corpus slice (natural text follows freq ∝ rank^s with
    * s ≈ -1; templated/generated/spammy slices flatten or steepen the
    * curve, so the slope is a cheap corpus-level anomaly signal the
    * per-doc filters C36/C68 can't see). Least-squares slope/r² of
    * ln(freq) on ln(rank), ranks from a (freq desc, token) total order.
    *
    * Scale shape: one partial-agg shuffle down to (stratum, token)
    * counts — state is each stratum's vocabulary, bounded for any
    * natural corpus (and cappable at top-K ranks, which is where a Zipf
    * fit's mass lives anyway) — then a vocab-sized window and a
    * |strata|-row regression aggregate. The corpus is never rescanned.
    *
    * Determinism: regr_slope/regr_r2 sum doubles in engine order, so
    * per-point terms are round(9)-snapped (ln of exact long counts and
    * of dense integer ranks — identical operands both sides) and the
    * ≤1e-12 summation-order residue dies in the final round(4). */
  def zipfSlope(docs: DataFrame, textCol: String,
                stratumCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = docs
      .select(col(stratumCol).as("stratum"),
        explode(split(col(textCol), " ")).as("tok"))
      .groupBy(col("stratum"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("stratum"))
      .orderBy(desc("cnt"), col("tok"))
    counts
      .withColumn("lr", round(log(row_number().over(w).cast("double")), 9))
      .withColumn("lf", round(log(col("cnt").cast("double")), 9))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("vocab"),
        sum(col("cnt")).as("n_tokens"),
        round(regr_slope(col("lf"), col("lr")), 4).as("zipf_slope"),
        round(regr_r2(col("lf"), col("lr")), 4).as("zipf_r2"))
  }

  /** DuckDB mirror of [[zipfSlope]] (same rank order, same ladder). */
  def zipfSlopeSql(table: String, text: String, stratum: String): String =
    s"""WITH counts AS (
       |  SELECT $stratum AS stratum,
       |         unnest(string_split($text, ' ')) AS tok
       |  FROM $table),
       |c AS (SELECT stratum, tok, count(*) AS cnt FROM counts GROUP BY 1, 2),
       |pts AS (
       |  SELECT stratum, cnt,
       |         round(ln(CAST(row_number() OVER (
       |             PARTITION BY stratum ORDER BY cnt DESC, tok)
       |           AS DOUBLE)), 9) AS lr,
       |         round(ln(CAST(cnt AS DOUBLE)), 9) AS lf
       |  FROM c)
       |SELECT stratum, count(*) AS vocab,
       |       CAST(sum(cnt) AS BIGINT) AS n_tokens,
       |       round(regr_slope(lf, lr), 4) AS zipf_slope,
       |       round(regr_r2(lf, lr), 4) AS zipf_r2
       |FROM pts GROUP BY 1""".stripMargin

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
