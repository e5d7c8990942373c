package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus bigram language model with interpolated (Jelinek-Mercer)
  * smoothing and per-document log-probability scoring — the order-2
  * upgrade of [[Unigram.logProbScores]]: P(w₂|w₁) = λ·c(w₁w₂)/c(w₁) +
  * (1−λ)·c(w₂)/N. Word-salad that passes a unigram filter (common
  * tokens in nonsense order) scores low here; fluent text scores high
  * — the CCNet/KenLM-style quality gate one order up.
  *
  * Scale shape: adjacent-pair extraction is SCAN-LOCAL (slice +
  * arrays_zip + explode — the C60/BPE idiom, no self-join); the bigram
  * and unigram vocabularies are partial-agg groupBys; scoring re-joins
  * the pair stream against both vocabularies on token keys (hot but
  * combine-friendly) and the 1-row corpus total broadcasts. For a
  * bounded-vocab 100 TB variant, hash both models into fixed buckets
  * and broadcast them (the C61/DSIR hashing trick) — same contract.
  *
  * Cross-engine determinism (SURVEY §6): counts are exact longs; the
  * smoothing arithmetic is the same literal double chain in both
  * engines, per-pair log-probs round(9) before the per-doc aggregate,
  * outputs round(4). Docs with fewer than two tokens have no bigrams
  * and are absent from the output (contract, mirrored by the oracle).
  */
object Bigram {

  /** Per-document bigram score: (idCol, n_bigrams, avg_logprob,
    * min_logprob); `lambda` is the bigram interpolation weight. */
  def logProbScores(docs: DataFrame, idCol: String, textCol: String,
                    lambda: Double = 0.8): DataFrame = {
    val arr = docs.select(col(idCol), split(col(textCol), " ").as("__a"))
      .localCheckpoint() // feeds tokens AND pairs; split the text once
    val toks = arr.select(explode(col("__a")).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("c1"))
      .localCheckpoint() // three consumers: total + two scoring joins
    val total = uni.agg(sum(col("c1")).as("n_corpus"))
    val n1 = greatest(size(col("__a")) - 1, lit(0))
    val pairs = arr
      .select(col(idCol),
        explode(arrays_zip(slice(col("__a"), lit(1), n1),
          slice(col("__a"), lit(2), n1))).as("p"))
      .select(col(idCol), col("p.0").as("w1"), col("p.1").as("w2"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // (λ·c2)/c_w1 + ((1−λ)·c_w2)/N — association mirrors the SQL.
    val p = (lit(lambda) * col("c2").cast("double")) / col("c_w1").cast("double") +
      (lit(1.0 - lambda) * col("c_w2").cast("double")) / col("n_corpus").cast("double")
    pairs
      .join(bi, Seq("w1", "w2"))
      .join(uni.select(col("tok").as("w1"), col("c1").as("c_w1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c1").as("c_w2")), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col(idCol), round(log(p), 9).as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 4).as("avg_logprob"),
        round(min(col("lp")), 4).as("min_logprob"))
  }

  /** Per-document INTERPOLATED KNESER-NEY bigram score — the smoothing
    * that made n-gram LMs competitive (Kneser & Ney '95; Chen &
    * Goodman '98 empirical study): instead of backing off to raw
    * unigram frequency (which over-scores tokens frequent only inside
    * one fixed phrase), the lower-order weight is the CONTINUATION
    * probability — in how many distinct contexts does w₂ appear:
    *
    *   P(w₂|w₁) = max(c(w₁w₂)−D, 0)/c(w₁·)
    *            + (D·N₁₊(w₁·)/c(w₁·)) · (N₁₊(·w₂)/N₁₊(··))
    *
    * Every model statistic is a grouped aggregate of the bigram-type
    * table (context totals, follower fan-out, predecessor fan-in,
    * global type count) — exact longs, partial-agg combine-friendly;
    * the probability chain is the same literal double expression in
    * both engines; log-probs round(9) before the per-doc aggregate.
    * Same scale shape as [[logProbScores]]: scan-local pair
    * extraction, token-keyed scoring joins, 1-row type-total
    * broadcast. Scored pairs come from the corpus, so c ≥ 1 > D and
    * the discounted mass is always positive. */
  def knLogProbScores(docs: DataFrame, idCol: String, textCol: String,
                      discount: Double = 0.75): DataFrame = {
    val arr = docs.select(col(idCol), split(col(textCol), " ").as("__a"))
      .localCheckpoint()
    val n1 = greatest(size(col("__a")) - 1, lit(0))
    val pairs = arr
      .select(col(idCol),
        explode(arrays_zip(slice(col("__a"), lit(1), n1),
          slice(col("__a"), lit(2), n1))).as("p"))
      .select(col(idCol), col("p.0").as("w1"), col("p.1").as("w2"))
    val bi = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .localCheckpoint() // four consumers: ctx, cont, types, scoring
    val ctx = bi.groupBy("w1")
      .agg(sum(col("c2")).as("cw1"), count(lit(1)).as("nf"))
    val cont = bi.groupBy("w2").agg(count(lit(1)).as("np"))
    val types = bi.agg(count(lit(1)).as("nt"))
    val hi = greatest(col("c2").cast("double") - lit(discount), lit(0.0))
      .divide(col("cw1").cast("double"))
    val lo = (lit(discount) * col("nf").cast("double"))
      .divide(col("cw1").cast("double"))
      .multiply(col("np").cast("double") / col("nt").cast("double"))
    val p = hi + lo
    pairs
      .join(bi, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .join(cont, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col(idCol), round(log(p), 9).as("lp"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("lp")), 4).as("avg_logprob"),
        round(min(col("lp")), 4).as("min_logprob"))
  }

  /** DuckDB mirror of [[knLogProbScores]] — same model statistics,
    * probability chain, association order, and rounding ladder. */
  def knLogProbScoresSql(table: String, id: String, text: String,
                         discount: Double = 0.75): String =
    s"""WITH arr AS (SELECT $id, string_split($text, ' ') AS a FROM $table),
       |pos AS (
       |  SELECT $id, a, generate_subscripts(a, 1) AS pos FROM arr),
       |pairs AS (
       |  SELECT $id, a[pos] AS w1, a[pos + 1] AS w2
       |  FROM pos WHERE pos < len(a)),
       |bi AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
       |ctx AS (
       |  SELECT w1, CAST(sum(c2) AS BIGINT) AS cw1, count(*) AS nf
       |  FROM bi GROUP BY 1),
       |cont AS (SELECT w2, count(*) AS np FROM bi GROUP BY 1),
       |types AS (SELECT count(*) AS nt FROM bi),
       |lp AS (
       |  SELECT $id,
       |    round(ln(greatest(CAST(c2 AS DOUBLE) - $discount, 0.0)
       |        / CAST(cw1 AS DOUBLE)
       |      + (($discount * CAST(nf AS DOUBLE)) / CAST(cw1 AS DOUBLE))
       |        * (CAST(np AS DOUBLE) / CAST(nt AS DOUBLE))), 9) AS lp
       |  FROM pairs
       |  JOIN bi USING (w1, w2)
       |  JOIN ctx USING (w1)
       |  JOIN cont USING (w2), types)
       |SELECT $id, count(*) AS n_bigrams,
       |       round(avg(lp), 4) AS avg_logprob,
       |       round(min(lp), 4) AS min_logprob
       |FROM lp GROUP BY 1""".stripMargin

  /** DuckDB mirror of [[logProbScores]] — same pair extraction, same
    * smoothing chain and association order, same rounding ladder. */
  def logProbScoresSql(table: String, id: String, text: String,
                       lambda: Double = 0.8): String =
    s"""WITH arr AS (SELECT $id, string_split($text, ' ') AS a FROM $table),
       |toks AS (SELECT unnest(a) AS tok FROM arr),
       |uni AS (SELECT tok, count(*) AS c1 FROM toks GROUP BY 1),
       |total AS (SELECT CAST(sum(c1) AS BIGINT) AS n_corpus FROM uni),
       |pos AS (
       |  SELECT $id, a, generate_subscripts(a, 1) AS pos FROM arr),
       |pairs AS (
       |  SELECT $id, a[pos] AS w1, a[pos + 1] AS w2
       |  FROM pos WHERE pos < len(a)),
       |bi AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY 1, 2),
       |lp AS (
       |  SELECT $id,
       |    round(ln(($lambda * c2) / u1.c1
       |      + (${1.0 - lambda} * u2.c1) / n_corpus), 9) AS lp
       |  FROM pairs
       |  JOIN bi USING (w1, w2)
       |  JOIN uni u1 ON u1.tok = w1
       |  JOIN uni u2 ON u2.tok = w2, total)
       |SELECT $id, count(*) AS n_bigrams,
       |       round(avg(lp), 4) AS avg_logprob,
       |       round(min(lp), 4) AS min_logprob
       |FROM lp GROUP BY 1""".stripMargin
}
