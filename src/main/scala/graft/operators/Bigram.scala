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
