package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary drift between two corpus snapshots — Jensen-Shannon
  * divergence of their hashed-unigram distributions, the monitoring
  * statistic that answers "did crawl N+1 change WHAT the corpus talks
  * about, not just which documents it holds" (the distributional
  * companion to [[Dedup.snapshotDiff]]'s per-document dispositions;
  * run both after every re-crawl, alert on a JS jump).
  *
  * Scale shape (the C61/DSIR hashing trick): tokens hash into a FIXED
  * bucket count at the scan, so each side reduces to ≤`buckets` rows
  * in one combine-friendly groupBy no matter the corpus size; the
  * bucket-spine join and all arithmetic run on two ≤`buckets`-row
  * frames; totals broadcast. Nothing downstream of the token count
  * scales with the data.
  *
  * Cross-engine determinism (SURVEY §6): counts are exact longs;
  * Laplace-smoothed probabilities and the JS terms are identical
  * literal double chains; per-bucket contributions round(9) then sum
  * on the scaled-e9 DECIMAL(38,0) ladder → `js_e9` BIGINT (JS ≤ ln 2,
  * so e9 fits long trivially). Identical snapshots give js_e9 = 0
  * exactly (every pa = pb = m makes ln 1 = 0 before rounding). */
object Drift {

  /** N-gram diversity report (C111) — distinct-n over total-n per
    * stratum for n ∈ 1..`maxN` (the distinct-1/2/3 diversity family of
    * Li et al. 2016 and Texygen's self-BLEU proxy): THE mode-collapse
    * screen for synthetic/generated corpora, where dedup passes nothing
    * (every sample is unique) but the n-gram space quietly shrinks.
    * Output per (stratum, n): `total_ngrams`, `distinct_ngrams`,
    * `distinct_e4` = (10000·distinct) div total — an exact integer
    * ladder, no float ratios.
    *
    * Scale shape: totals need NO explode at all — per-doc positional
    * gram count is `max(len − n + 1, 0)`, computed arithmetically at
    * the scan and partial-agg summed. Distincts ride the compiled
    * per-doc-distinct shingle pass ([[graft.functions.ShingleStrings]]):
    * the union of per-doc distinct sets has the same GLOBAL distinct
    * count as the raw gram stream, so the count-distinct shuffle
    * carries each doc's distinct grams once, never the positional
    * stream. One aggregate per n over the same scan (union of maxN
    * branches — each a combine-friendly two-level agg). */
  def ngramDiversity(docs: DataFrame, textCol: String, stratumCol: String,
                     maxN: Int = 3): DataFrame = {
    import graft.functions.SetOps
    (1 to maxN).map { n =>
      val len = size(split(col(textCol), " "))
      val totals = docs
        .groupBy(col(stratumCol).as("stratum"))
        .agg(sum(greatest(len - lit(n - 1), lit(0)).cast("long"))
          .as("total_ngrams"))
      val distincts = docs
        .select(col(stratumCol).as("stratum"),
          explode(SetOps.shingleStrings(col(textCol), n)).as("__g"))
        .groupBy(col("stratum"))
        .agg(countDistinct(col("__g")).as("distinct_ngrams"))
      totals.join(distincts, Seq("stratum"), "left")
        .select(col("stratum"), lit(n).cast("long").as("n"),
          col("total_ngrams"),
          coalesce(col("distinct_ngrams"), lit(0L)).as("distinct_ngrams"))
        .withColumn("distinct_e4",
          when(col("total_ngrams") > 0,
            expr("(10000 * distinct_ngrams) div total_ngrams")))
    }.reduce(_ unionAll _)
  }

  /** DuckDB mirror of [[ngramDiversity]]: same arithmetic totals, same
    * per-doc-distinct union for the global distinct count, same e4
    * integer ladder. */
  def ngramDiversitySql(table: String, text: String, stratum: String,
                        maxN: Int = 3): String = {
    def branch(n: Int): String = {
      val gram = (0 until n).map(o => s"t[i+$o]").mkString(" || ' ' || ")
      s"""SELECT tt.stratum, CAST($n AS BIGINT) AS n,
         |  tt.total_ngrams,
         |  coalesce(dd.distinct_ngrams, 0) AS distinct_ngrams,
         |  CASE WHEN tt.total_ngrams > 0
         |       THEN CAST((10000 * coalesce(dd.distinct_ngrams, 0))
         |                 // tt.total_ngrams AS BIGINT)
         |  END AS distinct_e4
         |FROM (
         |  SELECT $stratum AS stratum,
         |    CAST(sum(greatest(len(string_split($text, ' ')) - ${n - 1}, 0))
         |      AS BIGINT) AS total_ngrams
         |  FROM $table GROUP BY 1) tt
         |LEFT JOIN (
         |  SELECT stratum, CAST(count(DISTINCT g) AS BIGINT)
         |    AS distinct_ngrams
         |  FROM (
         |    SELECT $stratum AS stratum,
         |      unnest([$gram
         |        for i in generate_series(1, len(t) - ${n - 1})]) AS g
         |    FROM (SELECT $stratum, string_split($text, ' ') AS t
         |          FROM $table) s) u
         |  GROUP BY 1) dd USING (stratum)""".stripMargin
    }
    (1 to maxN).map(branch).mkString("\nUNION ALL\n")
  }

  /** One-row drift summary: (n_tokens_prev, n_tokens_next,
    * n_buckets_shifted, js_e9). `js_e9` is the JS divergence (natural
    * log) scaled by 1e9; `n_buckets_shifted` counts hash buckets whose
    * raw token counts differ — the cheap "where did it move" cardinality
    * to pair with the magnitude. */
  def vocabDrift(prev: DataFrame, next: DataFrame, textCol: String,
                 buckets: Int = 256): DataFrame = {
    def bucketCounts(df: DataFrame, cntName: String): DataFrame =
      df.select(explode(split(col(textCol), " ")).as("tok"))
        .select(pmod(MinHash.hash32(col("tok")), lit(buckets.toLong)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as(cntName))
    val spark = prev.sparkSession
    val spine = spark.range(buckets).select(col("id").as("b"))
    val joined = spine
      .join(bucketCounts(prev, "ca"), Seq("b"), "left")
      .join(bucketCounts(next, "cb"), Seq("b"), "left")
      .na.fill(0L, Seq("ca", "cb"))
      .localCheckpoint() // totals + contributions read it twice
    val totals = joined.agg(sum(col("ca")).cast("long").as("na"),
      sum(col("cb")).cast("long").as("nb"))
    val pa = (col("ca") + lit(1.0)) / (col("na") + lit(buckets)).cast("double")
    val pb = (col("cb") + lit(1.0)) / (col("nb") + lit(buckets)).cast("double")
    val contrib =
      lit(0.5) * col("pa") * log(col("pa") / col("m")) +
        lit(0.5) * col("pb") * log(col("pb") / col("m"))
    joined
      .crossJoin(broadcast(totals))
      .select(col("ca"), col("cb"), col("na"), col("nb"),
        pa.as("pa"), pb.as("pb"))
      .withColumn("m", (col("pa") + col("pb")) / lit(2.0))
      .select(col("ca"), col("cb"), col("na"), col("nb"),
        round(contrib, 9).as("c9"))
      .groupBy(col("na"), col("nb"))
      .agg(
        sum(when(col("ca") =!= col("cb"), 1L).otherwise(0L))
          .cast("long").as("n_buckets_shifted"),
        sum((round(col("c9"), 9) * 1e9).cast("decimal(38,0)"))
          .cast("long").as("js_e9"))
      .select(col("na").as("n_tokens_prev"), col("nb").as("n_tokens_next"),
        col("n_buckets_shifted"), col("js_e9"))
  }

  /** DuckDB mirror of [[vocabDrift]] — same hash-bucketing, spine,
    * smoothing chain, association order, and e9 ladder. `prevRel` /
    * `nextRel` are relation expressions exposing `textExpr`. */
  def vocabDriftSql(prevRel: String, nextRel: String, textExpr: String,
                    buckets: Int = 256): String = {
    def cnt(rel: String, name: String) =
      s"""SELECT ('0x' || substr(md5(tok), 1, 8))::BIGINT % $buckets AS b,
         |    count(*) AS $name
         |  FROM (SELECT unnest(string_split($textExpr, ' ')) AS tok
         |        FROM $rel) t GROUP BY 1""".stripMargin
    s"""WITH ka AS (
       |  ${cnt(prevRel, "ca")}),
       |kb AS (
       |  ${cnt(nextRel, "cb")}),
       |spine AS (SELECT unnest(generate_series(0, ${buckets - 1})) AS b),
       |j AS (
       |  SELECT spine.b, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
       |  FROM spine LEFT JOIN ka ON ka.b = spine.b
       |             LEFT JOIN kb ON kb.b = spine.b),
       |tot AS (
       |  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
       |  FROM j),
       |p AS (
       |  SELECT ca, cb, na, nb,
       |    (ca + 1.0) / CAST(na + $buckets AS DOUBLE) AS pa,
       |    (cb + 1.0) / CAST(nb + $buckets AS DOUBLE) AS pb
       |  FROM j, tot),
       |c AS (
       |  SELECT ca, cb, na, nb,
       |    round(0.5 * pa * ln(pa / ((pa + pb) / 2.0))
       |      + 0.5 * pb * ln(pb / ((pa + pb) / 2.0)), 9) AS c9
       |  FROM p)
       |SELECT na AS n_tokens_prev, nb AS n_tokens_next,
       |  CAST(sum(CASE WHEN ca <> cb THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_buckets_shifted,
       |  CAST(sum(CAST(round(c9, 9) * 1e9 AS DECIMAL(38,0))) AS BIGINT)
       |    AS js_e9
       |FROM c GROUP BY 1, 2""".stripMargin
  }
}
