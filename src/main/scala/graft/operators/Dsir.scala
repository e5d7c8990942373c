package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every raw-corpus
  * document by how target-like it is under hashed n-gram bag-of-words
  * language models — log w(x) = Σ_f c_f · (ln p_target(f) − ln
  * p_raw(f)) — the standard cheap alternative to classifier-based
  * quality filtering when composing a training mix toward a target
  * domain.
  *
  * Scale shape: feature extraction is scan-local (bigrams from two
  * slices + arrays_zip, bucketed by the house first-8-hex-of-md5 mod
  * `buckets`); per-doc feature counts are one combine-friendly
  * groupBy; BOTH language models are ≤`buckets`-row aggregates of
  * that frame (the hashing trick caps model size regardless of corpus
  * vocabulary) and broadcast back onto it — so the corpus is
  * tokenized once and shuffled once, and nothing model-sized ever
  * shuffles with it.
  *
  * Determinism: bucket ids are md5-derived (exact in both engines);
  * the only transcendental is the per-bucket log-ratio, rounded to 9
  * places; per-doc sums follow SURVEY §6's scaled-e9 DECIMAL(38,0)
  * discipline → `logweight_e9` BIGINT. */
object Dsir {

  val Buckets = 1024

  /** First 8 hex of md5 → [0, 2³²) → mod `buckets` (house pattern,
    * MinHash.scala). */
  private def bucketOf(c: Column, buckets: Int): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long") % buckets

  /** Per-document hashed-bigram counts: (idCol, is_target, bucket, c).
    * `targetPred` marks the rows whose features define the target
    * model (they stay in the raw model too — DSIR's raw side is the
    * full corpus). */
  def hashedBigramFeatures(docs: DataFrame, idCol: String,
                           textCol: String, targetPred: Column,
                           buckets: Int = Buckets): DataFrame = {
    require(buckets >= 2, s"DSIR needs buckets >= 2 (got $buckets)")
    val a = split(col(textCol), " ")
    val n1 = greatest(size(a) - 1, lit(0))
    val pairs = arrays_zip(slice(a, lit(1), n1), slice(a, lit(2), n1))
    docs
      .select(col(idCol), targetPred.as("is_target"),
        explode(pairs).as("p"))
      .select(col(idCol), col("is_target"),
        bucketOf(concat_ws(" ", col("p.0"), col("p.1")), buckets)
          .as("bucket"))
      .groupBy(col(idCol), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Importance weights for every document: (idCol, n_feats,
    * logweight_e9). Laplace-smoothed (+1 / +buckets) hashed-bigram
    * models; positive = more target-like than the corpus average. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column,
                        buckets: Int = Buckets): DataFrame = {
    val feats = hashedBigramFeatures(docs, idCol, textCol, targetPred,
      buckets).localCheckpoint() // model aggs + scoring reuse it
    val rawM = feats.groupBy("bucket").agg(sum("c").as("cr"))
    val tgtM = feats.where(col("is_target"))
      .groupBy("bucket").agg(sum("c").as("ct"))
    val tot = feats.agg(sum("c").as("tr"),
      sum(when(col("is_target"), col("c")).otherwise(0L)).as("tt"))
    val d9 = round(
      log((coalesce(col("ct"), lit(0L)) + 1.0) / (col("tt") + buckets)) -
        log((col("cr") + 1.0) / (col("tr") + buckets)), 9)
    val model = rawM.join(tgtM, Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
      .select(col("bucket"), d9.as("d9"))
    feats
      .join(broadcast(model), "bucket")
      .groupBy(col(idCol))
      .agg(sum("c").as("n_feats"),
        sum((round(col("c") * col("d9"), 9) * 1e9)
          .cast("decimal(38,0)")).cast("long").as("logweight_e9"))
  }

  /** DuckDB mirror of [[importanceWeights]]; `targetPredSql` is the
    * predicate over the table's columns. */
  def importanceWeightsSql(table: String, id: String, text: String,
                           targetPredSql: String,
                           buckets: Int = Buckets): String =
    s"""WITH arr AS (
       |  SELECT $id, ($targetPredSql) AS is_t,
       |         string_split($text, ' ') AS a
       |  FROM $table),
       |toks AS (
       |  SELECT $id, is_t, a, generate_subscripts(a, 1) AS pos,
       |         unnest(a) AS tok
       |  FROM arr),
       |feats AS (
       |  SELECT $id, is_t,
       |         ('0x' || substr(md5(a[pos] || ' ' || a[pos+1]), 1, 8))::BIGINT
       |           % $buckets AS bucket,
       |         count(*) AS c
       |  FROM toks WHERE pos < len(a)
       |  GROUP BY 1, 2, 3),
       |rawm AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS cr
       |         FROM feats GROUP BY 1),
       |tgtm AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS ct
       |         FROM feats WHERE is_t GROUP BY 1),
       |tot AS (
       |  SELECT CAST(sum(c) AS BIGINT) AS tr,
       |         CAST(sum(CASE WHEN is_t THEN c ELSE 0 END) AS BIGINT) AS tt
       |  FROM feats),
       |model AS (
       |  SELECT r.bucket,
       |         round(ln((coalesce(ct, 0) + 1.0) / (tt + $buckets))
       |             - ln((cr + 1.0) / (tr + $buckets)), 9) AS d9
       |  FROM rawm r LEFT JOIN tgtm USING (bucket), tot)
       |SELECT f.$id, CAST(sum(f.c) AS BIGINT) AS n_feats,
       |       CAST(sum(CAST(round(f.c * d9, 9) * 1e9 AS DECIMAL(38,0)))
       |         AS BIGINT) AS logweight_e9
       |FROM feats f JOIN model USING (bucket)
       |GROUP BY 1""".stripMargin
}
