package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split operators for training-data
  * pipelines.
  *
  * A training pipeline needs splits and samples that are (a) stable
  * across runs and engines — re-running the pipeline on a re-crawl must
  * put the same document in the same split, or eval sets leak into
  * train — and (b) free at scale. Both come from hashing the document
  * id into a bucket 0..n-1 with the engine-portable 32-bit md5 prefix
  * ([[MinHash.hash32]]) instead of `rand()`-style sampling:
  *
  *  - '''no shuffle, no state''': bucket assignment is a scan-local
  *    projection and sampling is a scan-local filter — at 100 TB this
  *    touches each row once, pushes the filter into the scan, and never
  *    materializes an ordering (vs `orderBy(rand()).limit(n)`, a global
  *    sort that dies at scale);
  *  - '''deterministic across engines''': the same md5-bucket rule is
  *    expressible in ANSI SQL, so the DuckDB oracle applies the
  *    identical rule (generated from the same constants — the SQL
  *    below IS the Scala constants, engines can't drift).
  */
object Sampling {

  /** Portable hash bucket 0..n-1 for a row id (any type; cast to its
    * string form first so Spark and SQL engines hash identical bytes). */
  def bucket(id: Column, n: Int): Column =
    pmod(MinHash.hash32(id.cast("string")), lit(n.toLong))

  /** DuckDB form of [[bucket]] — same md5-prefix rule, same bytes. */
  def bucketSql(id: String, n: Int): String =
    s"(('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 8))::BIGINT % $n)"

  /** Deterministic train/valid/test-style split assignment. `splits`
    * maps each label to a percentage; percentages must sum to 100.
    * A document's label depends only on its id — stable under
    * re-crawls, incremental appends, and engine choice. */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percentages must sum to 100")
    val b = bucket(col(idCol), 100)
    val cumulative = splits.scanLeft(0)(_ + _._2).tail
    // CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test':
    // fold the ranges right-to-left so the first matching range wins
    val caseExpr = splits.zip(cumulative).dropRight(1).reverse
      .foldLeft(lit(splits.last._1): Column) {
        case (acc, ((label, _), hi)) => when(b < hi, lit(label)).otherwise(acc)
      }
    df.withColumn("split", caseExpr)
  }

  /** DuckDB CASE expression matching [[assignSplit]]. */
  def splitCaseSql(id: String, splits: Seq[(String, Int)]): String = {
    val b = bucketSql(id, 100)
    val cumulative = splits.scanLeft(0)(_ + _._2).tail
    val whens = splits.zip(cumulative).dropRight(1)
      .map { case ((label, _), hi) => s"WHEN $b < $hi THEN '$label'" }
    s"CASE ${whens.mkString(" ")} ELSE '${splits.last._1}' END"
  }

  /** Stratified deterministic sample: keep `pct(stratum)`% of each
    * stratum (default `defaultPct`% for unlisted strata) — the
    * training-mix rebalance (up/down-weight languages or sources)
    * as a scan-local filter. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       pct: Map[String, Int], defaultPct: Int): DataFrame = {
    val b = bucket(col(idCol), 100)
    val rate = pct.toSeq.sortBy(_._1).foldLeft(lit(defaultPct): Column) {
      case (acc, (stratum, p)) => when(col(stratumCol) === stratum, lit(p)).otherwise(acc)
    }
    df.where(b < rate)
  }

  /** DuckDB WHERE fragment matching [[stratifiedSample]]. */
  def stratifiedWhereSql(id: String, stratum: String,
                         pct: Map[String, Int], defaultPct: Int): String = {
    val b = bucketSql(id, 100)
    val cases = pct.toSeq.sortBy(_._1)
      .map { case (s, p) => s"WHEN '$s' THEN $p" }.mkString(" ")
    s"$b < (CASE $stratum $cases ELSE $defaultPct END)"
  }

  /** Quality-ordered token-budget selection: take documents in
    * (`scoreCol` DESC, `idCol` ASC) order until the running total of
    * `weightCol` exceeds `budget` — "best docs until the token budget is
    * spent", the curation step that turns a scored corpus into a
    * training set of a target size.
    *
    * Scale shape: the textbook form is one global window
    * (`sum(weight) OVER (ORDER BY score DESC)`), which funnels the
    * entire corpus through a single task. This instead decomposes the
    * prefix sum exactly like [[graft.queries.Docs]]' vocab rank:
    * score-band partitioning. Rows are bucketed by a coarse score band
    * (bands are a total-order refinement: every row in a higher band
    * sorts before every row in a lower band), the running sum inside
    * each band is a PARTITIONED window, and each band's offset (total
    * weight of all higher bands) comes from a broadcast join of the
    * tiny per-band aggregate against itself. At 100 TB: one shuffle on
    * the band key with ~|bands| ≪ cores partitions would skew, so the
    * in-band window partitions on (band) but bands are chosen from the
    * score's leading digits — for finer parallelism raise `bands`.
    * Output: all selected rows + `cum_weight`, the global running total
    * at that row. */
  def budgetSelect(df: DataFrame, idCol: String, scoreCol: String,
                   weightCol: String, budget: Long,
                   bands: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // band 0 = best scores; floor keeps banding a pure function of the
    // score so both engines agree on the partition for every row
    val band = (lit(bands - 1) -
      floor(col(scoreCol) * bands).cast("long"))
      .as("__band")
    val banded = df.withColumn("__band",
      greatest(lit(0L), least(lit(bands - 1L), band)))
    val w = Window.partitionBy(col("__band"))
      .orderBy(col(scoreCol).desc, col(idCol))
    val inBand = banded.withColumn("__cum_in_band",
      sum(col(weightCol)).over(w))
    val totals = banded.groupBy(col("__band"))
      .agg(sum(col(weightCol)).as("__band_w"))
    val offsets = totals.as("a")
      .join(totals.as("b"), col("b.__band") < col("a.__band"), "left")
      .groupBy(col("a.__band").as("__band2"))
      .agg(coalesce(sum(col("b.__band_w")), lit(0L)).as("__offset"))
    inBand.join(broadcast(offsets), col("__band") === col("__band2"))
      .withColumn("cum_weight", col("__offset") + col("__cum_in_band"))
      .where(col("cum_weight") <= budget)
      .drop("__band", "__band2", "__cum_in_band", "__offset")
  }

  /** [[budgetSelect]] with an independent budget PER STRATUM — the
    * "domain cap" curation rule: no source/domain may contribute more
    * than `budget` weight (tokens) to the training mix, filled
    * best-score-first within each stratum. Callers with per-stratum
    * caps that differ can pre-divide `weightCol` by the stratum's cap
    * and pass `budget = 1` scaled appropriately.
    *
    * Scale shape: identical banded prefix-sum decomposition as
    * [[budgetSelect]], but every window and offset is keyed by
    * (stratum, band) — the in-band window shuffles on
    * |strata|×|bands| keys (parallelism grows with the number of
    * domains instead of shrinking), and the offset table stays a
    * broadcast-size aggregate. The offsets self-join carries the
    * stratum equality, so it plans as a hash join, not a nested loop. */
  def budgetSelectPerStratum(df: DataFrame, idCol: String,
                             scoreCol: String, weightCol: String,
                             stratumCol: String, budget: Long,
                             bands: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val band = lit(bands - 1) - floor(col(scoreCol) * bands).cast("long")
    val banded = df.withColumn("__band",
      greatest(lit(0L), least(lit(bands - 1L), band)))
    val w = Window.partitionBy(col(stratumCol), col("__band"))
      .orderBy(col(scoreCol).desc, col(idCol))
    val inBand = banded.withColumn("__cum_in_band",
      sum(col(weightCol)).over(w))
    val totals = banded.groupBy(col(stratumCol), col("__band"))
      .agg(sum(col(weightCol)).as("__band_w"))
    val offsets = totals.as("a")
      .join(totals.as("b"),
        col(s"b.$stratumCol") === col(s"a.$stratumCol") &&
          col("b.__band") < col("a.__band"), "left")
      .groupBy(col(s"a.$stratumCol").as("__s2"),
        col("a.__band").as("__band2"))
      .agg(coalesce(sum(col("b.__band_w")), lit(0L)).as("__offset"))
    inBand.join(broadcast(offsets),
        col(stratumCol) === col("__s2") && col("__band") === col("__band2"))
      .withColumn("cum_weight", col("__offset") + col("__cum_in_band"))
      .where(col("cum_weight") <= budget)
      .drop("__band", "__s2", "__band2", "__cum_in_band", "__offset")
  }

  /** Keep the top `keepPct`% of each stratum by score — the
    * quality-percentile pruning rule ("drop the worst 60% of every
    * domain"), selected by EXACT integer rank so both engines agree on
    * every boundary row: a stratum of n rows keeps rank ≤
    * ceil(n·keepPct/100) under (score desc, id) order — never a
    * floating threshold comparison on the score itself.
    *
    * Scale shape: the same banded prefix-sum decomposition as
    * [[budgetSelect]] — ranks come from a window over (stratum, band)
    * plus a broadcast per-band row-count offset, so a huge stratum
    * sorts as `bands` independent partitions instead of one hot
    * reducer; per-stratum totals join broadcast-size. Equal scores
    * always share a band (banding is a pure function of the score), so
    * offset + in-band rank IS the per-stratum rank. */
  def topPctPerStratum(df: DataFrame, idCol: String, scoreCol: String,
                       stratumCol: String, keepPct: Int,
                       bands: Int = 20): DataFrame = {
    require(keepPct >= 1 && keepPct <= 100, "keepPct must be in 1..100")
    import org.apache.spark.sql.expressions.Window
    val band = lit(bands - 1) - floor(col(scoreCol) * bands).cast("long")
    val banded = df.withColumn("__band",
      greatest(lit(0L), least(lit(bands - 1L), band)))
    val w = Window.partitionBy(col(stratumCol), col("__band"))
      .orderBy(col(scoreCol).desc, col(idCol))
    val inBand = banded.withColumn("__rk_in_band",
      row_number().over(w).cast("long"))
    val totals = banded.groupBy(col(stratumCol), col("__band"))
      .agg(count(lit(1)).as("__band_n"))
    val offsets = totals.as("a")
      .join(totals.as("b"),
        col(s"b.$stratumCol") === col(s"a.$stratumCol") &&
          col("b.__band") < col("a.__band"), "left")
      .groupBy(col(s"a.$stratumCol").as("__s2"),
        col("a.__band").as("__band2"))
      .agg(coalesce(sum(col("b.__band_n")), lit(0L)).as("__offset"))
    val strataN = totals.groupBy(col(stratumCol).as("__s3"))
      .agg(sum(col("__band_n")).as("__n"))
    inBand
      .join(broadcast(offsets),
        col(stratumCol) === col("__s2") && col("__band") === col("__band2"))
      .join(broadcast(strataN), col(stratumCol) === col("__s3"))
      .where(col("__offset") + col("__rk_in_band") <=
        expr(s"CAST((__n * $keepPct + 99) DIV 100 AS BIGINT)"))
      .drop("__band", "__s2", "__band2", "__rk_in_band", "__s3", "__n",
        "__offset")
  }

  /** Fixed-size deterministic sample PER STRATUM — n docs from every
    * stratum regardless of stratum size (the balanced eval-set / human-
    * review draw, vs [[stratifiedSample]]'s rate-based mix). "Random
    * but stable" comes from ordering by the md5-prefix hash of the id
    * (+ id tiebreak) inside a window PARTITIONED by stratum: re-runs
    * and engines agree, appends only displace rows that hash later.
    * Strata ≫ cores at scale and n is small, so the per-stratum sort
    * is a bounded top-n (InferWindowGroupLimit), never a global one. */
  def perStratumSample(df: DataFrame, idCol: String, stratumCol: String,
                       n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hashCol(col(idCol)), col(idCol))
    df.withColumn("draw", row_number().over(w).cast("long"))
      .where(col("draw") <= n)
  }

  /** The hash [[perStratumSample]] orders by (exposed for the oracle). */
  private def hashCol(id: Column): Column = MinHash.hash32(id.cast("string"))

  /** Deterministic weighted sampling WITHOUT replacement (Efraimidis–
    * Spirakis A-Res): row i draws u_i ∈ (0,1) from the md5-prefix
    * fraction of its id and gets selection key ln(u_i)/w_i; the n
    * LARGEST keys are the sample, so inclusion odds rise with weight —
    * the quality-weighted corpus draw ("sample 1M docs, prefer long /
    * high-score ones") that `orderBy(rand()*w)` can't do stably.
    *
    * Determinism: u comes from the id, never `rand()`, so re-runs,
    * engines, and appends agree row-by-row; keys are round(9)-laddered
    * before ordering with an id tiebreak (SURVEY §6). Scale shape: the
    * key is a scan-local projection and the global top-n plans as
    * TakeOrderedAndProject — per-partition n-row heaps, never a full
    * sort. Weights are clamped to ≥1 so a zero-weight row can't produce
    * -inf keys. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     n: Int): DataFrame = {
    val u = (hashCol(col(idCol)) + lit(0.5)) / lit(4294967296.0)
    df.withColumn("sel_key",
        round(log(u) / greatest(weightCol.cast("double"), lit(1.0)), 9))
      .orderBy(col("sel_key").desc, col(idCol))
      .limit(n)
  }

  /** DuckDB mirror of [[weightedSample]]'s selection key. */
  def weightedKeySql(id: String, weightExpr: String): String =
    s"""round(ln((('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
       |      / 4294967296.0) / greatest(CAST($weightExpr AS DOUBLE), 1.0), 9)""".stripMargin

  /** DuckDB mirror of [[perStratumSample]]'s window. */
  def perStratumRankSql(id: String, stratum: String): String =
    s"""row_number() OVER (PARTITION BY $stratum
       |      ORDER BY ('0x' || substr(md5(CAST($id AS VARCHAR)), 1, 8))::BIGINT,
       |               $id)""".stripMargin

  /** Temperature-scaled domain-mixture weights: per-stratum sampling
    * weight w_i ∝ n_i^alpha (the Pile/ROOTS-style mixture rule — alpha=1
    * is proportional sampling, alpha=0 uniform, alpha∈(0,1) up-weights
    * small domains), plus the epochs each stratum contributes toward a
    * target token budget (budget·w_i / n_i — >1 means the domain
    * repeats).
    *
    * Scale shape: ONE partial-aggregated groupBy on the stratum key (the
    * only full-corpus pass), then all the weight math happens on the
    * |strata|-row aggregate — the normalizing constant joins back as a
    * broadcast of a 1-row aggregate, never a second corpus scan and
    * never a window. Output rows = |strata|, so at 100 TB this costs
    * exactly one map-side-combined shuffle of (stratum, count) pairs. */
  def mixtureWeights(df: DataFrame, stratumCol: String, weightCol: Column,
                     alpha: Double, budget: Long): DataFrame = {
    // localCheckpoint the |strata|-row aggregate: the normalizer re-reads
    // it, and without the checkpoint that lineage re-runs the full corpus
    // scan a second time
    val perStratum = df.groupBy(col(stratumCol).as("stratum"))
      .agg(sum(weightCol).cast("long").as("n_tokens"),
        count(lit(1)).as("n_docs"))
      .withColumn("__w", pow(col("n_tokens").cast("double"), lit(alpha)))
      .localCheckpoint()
    val z = perStratum.agg(sum(col("__w")).as("__z"))
    perStratum.crossJoin(broadcast(z))
      .select(col("stratum"), col("n_docs"), col("n_tokens"),
        round(col("__w") / col("__z"), 4).as("mix_weight"),
        round(lit(budget.toDouble) * (col("__w") / col("__z"))
          / col("n_tokens"), 4).as("epochs"))
  }

  /** Repeat-capped epoch plan under a token budget — the C32 mixture
    * taken to an executable schedule (Muennighoff et al. 2023: repeating
    * data beyond ~4 epochs stops helping, so cap repeats and surface the
    * unfillable deficit instead of silently over-repeating a small
    * domain): per stratum, the α-weighted target token allocation, the
    * capped epoch count, the tokens actually scheduled, and the deficit
    * the mixer must redistribute. Integer outputs floor the SAME double
    * in both engines (target is a pure function of exact long counts via
    * pow/÷, so the doubles are bit-identical before the floor).
    *
    * Same scale shape as [[mixtureWeights]]: ONE map-side-combined
    * shuffle of (stratum, count) pairs; all plan math on the
    * |strata|-row aggregate; the normalizer a broadcast 1-row agg. */
  def epochPlan(df: DataFrame, stratumCol: String, weightCol: Column,
                alpha: Double, budget: Long, maxEpochs: Int): DataFrame = {
    val perStratum = df.groupBy(col(stratumCol).as("stratum"))
      .agg(sum(weightCol).cast("long").as("n_tokens"))
      .withColumn("__w", pow(col("n_tokens").cast("double"), lit(alpha)))
      .localCheckpoint()
    val z = perStratum.agg(sum(col("__w")).as("__z"))
    val target = lit(budget.toDouble) * (col("__w") / col("__z"))
    val targetL = floor(target).cast("long")
    val capL = col("n_tokens") * maxEpochs
    perStratum.crossJoin(broadcast(z))
      .select(col("stratum"), col("n_tokens"),
        round(col("__w") / col("__z"), 4).as("mix_weight"),
        targetL.as("target_tokens"),
        round(least(lit(maxEpochs.toDouble), target / col("n_tokens")), 4)
          .as("epochs"),
        least(targetL, capL).as("sampled_tokens"),
        greatest(lit(0L), targetL - capL).as("deficit_tokens"))
  }

  /** DuckDB mirror of [[epochPlan]] (same constants, same math). */
  def epochPlanSql(table: String, stratum: String, weightExpr: String,
                   alpha: Double, budget: Long, maxEpochs: Int): String =
    s"""WITH per AS (
       |  SELECT $stratum AS stratum,
       |         CAST(sum($weightExpr) AS BIGINT) AS n_tokens
       |  FROM $table GROUP BY 1),
       |z AS (SELECT sum(pow(n_tokens, $alpha)) AS z FROM per),
       |t AS (
       |  SELECT stratum, n_tokens, pow(n_tokens, $alpha) / z AS w,
       |         $budget * (pow(n_tokens, $alpha) / z) AS target
       |  FROM per, z)
       |SELECT stratum, n_tokens,
       |  round(w, 4) AS mix_weight,
       |  CAST(floor(target) AS BIGINT) AS target_tokens,
       |  round(least(CAST($maxEpochs AS DOUBLE), target / n_tokens), 4)
       |    AS epochs,
       |  least(CAST(floor(target) AS BIGINT), n_tokens * $maxEpochs)
       |    AS sampled_tokens,
       |  greatest(0, CAST(floor(target) AS BIGINT) - n_tokens * $maxEpochs)
       |    AS deficit_tokens
       |FROM t ORDER BY stratum""".stripMargin

  /** DuckDB mirror of [[mixtureWeights]] (same constants, same math). */
  def mixtureWeightsSql(table: String, stratum: String, weightExpr: String,
                        alpha: Double, budget: Long): String =
    s"""WITH per AS (
       |  SELECT $stratum AS stratum,
       |         CAST(sum($weightExpr) AS BIGINT) AS n_tokens,
       |         count(*) AS n_docs
       |  FROM $table GROUP BY 1),
       |z AS (SELECT sum(pow(n_tokens, $alpha)) AS z FROM per)
       |SELECT stratum, n_docs, n_tokens,
       |       round(pow(n_tokens, $alpha) / z, 4) AS mix_weight,
       |       round($budget * (pow(n_tokens, $alpha) / z) / n_tokens, 4)
       |         AS epochs
       |FROM per, z ORDER BY stratum""".stripMargin

  /** Deterministic epoch shuffle + shard assignment — the training-order
    * manifest: every doc gets a shard in [0, nShards) and a position
    * within that shard, both derived ONLY from (epoch, doc_id) via the
    * engine-portable md5 prefix. Re-running the pipeline, appending to
    * the corpus, or materializing on a different engine reproduces the
    * exact same order (what `orderBy(rand())` can never give a training
    * run), while a different epoch seed decorrelates the order between
    * epochs — the "reshuffle each epoch without a stateful shuffler"
    * contract of large-scale loaders. Shard and order use DOMAIN-
    * SEPARATED hashes ("shard:"/"order:" prefixes): one hash for both
    * would sort each shard by the same key that chose it, leaving
    * neighboring positions correlated across epochs.
    *
    * Scale shape: both hashes are scan-local projections; the only
    * exchange is the per-shard window (= the `repartition(shard).
    * sortWithinPartitions(order)` a sharded writer needs anyway), and
    * with nShards ≫ cores the windows parallelize with no global sort
    * and no skew (md5 buckets are uniform). Output: (id, shard, pos). */
  def epochShuffle(df: DataFrame, idCol: String, epoch: Int,
                   nShards: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val id = col(idCol).cast("string")
    val shard = pmod(
      MinHash.hash32(concat(lit(s"shard:$epoch:"), id)), lit(nShards.toLong))
    val orderKey = MinHash.hash32(concat(lit(s"order:$epoch:"), id))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__ok"), col(idCol))
    df.select(col(idCol), shard.as("shard"), orderKey.as("__ok"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__ok")
  }

  /** DuckDB mirror of [[epochShuffle]]'s (shard, pos) assignment. */
  def epochShuffleSql(table: String, id: String, epoch: Int,
                      nShards: Int): String =
    s"""SELECT $id, shard,
       |  row_number() OVER (PARTITION BY shard ORDER BY __ok, $id) AS pos
       |FROM (
       |  SELECT $id,
       |    ('0x' || substr(md5('shard:$epoch:' || CAST($id AS VARCHAR)), 1, 8))::BIGINT
       |      % $nShards AS shard,
       |    ('0x' || substr(md5('order:$epoch:' || CAST($id AS VARCHAR)), 1, 8))::BIGINT
       |      AS __ok
       |  FROM $table)""".stripMargin
}
