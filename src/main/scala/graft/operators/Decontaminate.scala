package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share word
  * n-grams with a held-out eval corpus, so they can be dropped before
  * pretraining (the standard n-gram-overlap contamination check).
  *
  * Scale shape: the eval corpus is benchmark-sized — tiny next to a
  * 100 TB train corpus — so its distinct n-gram hashes BROADCAST and
  * the train side stays one scan: explode each train doc's (already
  * distinct, codegen-hashed) shingle set, broadcast-hash-join against
  * the eval grams, and partial-aggregate matches per doc. Only matching
  * (doc, gram) rows — a vanishing fraction — reach the one shuffle (the
  * per-doc count). Never a train×eval comparison; if the "eval" side
  * ever rivals the train side, use [[MinHash.neardupPairs]] instead.
  *
  * Engine parity: grams are the portable 32-bit md5-prefix shingle
  * hashes ([[MinHash.hashedShingles]]); the DuckDB oracle is generated
  * from the same n / threshold constants in [[oracleSql]]. */
object Decontaminate {

  /** Train docs sharing ≥ `minOverlap` distinct word n-grams with the
    * eval corpus. Output: idCol, n_overlap (the count of distinct
    * shared n-grams). */
  def overlaps(train: DataFrame, eval: DataFrame, idCol: String,
               textCol: String, n: Int = 3, minOverlap: Int = 1): DataFrame = {
    val evalGrams = eval
      .select(explode(MinHash.hashedShingles(col(textCol), n)).as("g"))
      .distinct()
    train
      .select(col(idCol), explode(MinHash.hashedShingles(col(textCol), n)).as("g"))
      .join(broadcast(evalGrams), "g")
      // per-doc shingle sets are distinct, so plain count = distinct count
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
      .where(col("n_overlap") >= minOverlap)
  }

  /** FUZZY decontamination: train docs whose MinHash bands collide with
    * an eval doc's and whose exact Jaccard (on the hashed shingle sets)
    * is ≥ `threshold` — catches paraphrased/near-copy contamination that
    * exact n-gram overlap counting ([[overlaps]]) undercounts when the
    * wording shifts. Output: idCol, n_eval_matches, max_jaccard.
    *
    * Scale shape: the eval side is benchmark-sized, so its (band, key)
    * rows BROADCAST (hashed shingle sets riding along); the train side
    * is one scan + a 4-band explode into the broadcast hash join.
    * Train×eval is never formed — candidates ~ true near-dups exactly
    * like [[MinHash.neardupPairs]], but one-sided. */
  def fuzzyOverlaps(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, threshold: Double): DataFrame = {
    val evalBands = MinHash.bandRows(MinHash.signature(eval, idCol, textCol))
      .select(col("band"), col("bkey"),
        col("doc_id").as("__eval_id"), col("hv").as("he"))
    val trainBands = MinHash.bandRows(MinHash.signature(train, idCol, textCol))
      .select(col("doc_id"), col("hv").as("ht"), col("band"), col("bkey"))
    val inter = graft.functions.SetOps
      .sortedIntersectCount(col("ht"), col("he")).cast("double")
    val jac = inter / (size(col("ht")) + size(col("he")) - inter)
    trainBands
      .join(broadcast(evalBands), Seq("band", "bkey"))
      // a (train, eval) pair can collide in several bands — collapse
      // before the one Jaccard per pair (partial-agg map-side dedup)
      .groupBy(col("doc_id"), col("__eval_id"))
      .agg(first(col("ht")).as("ht"), first(col("he")).as("he"))
      .withColumn("__jac", jac)
      .where(col("__jac") >= threshold)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_eval_matches"),
        round(max(col("__jac")), 4).as("max_jaccard"))
  }

  /** DuckDB form of [[fuzzyOverlaps]] with eval = `$id % evalMod = 0`,
    * generated from the SAME MinHash constants as the Spark plan. */
  def fuzzyOracleSql(table: String, id: String, text: String,
                     threshold: Double, evalMod: Int): String = {
    val mhExprs = MinHash.coeffs.zipWithIndex.map { case ((a, b), j) =>
      s"list_min(list_transform(h, v -> (v*$a+$b)%${MinHash.P})) AS mh_$j"
    }.mkString(",\n       ")
    val bandSelects = (0 until MinHash.numBands).map { b =>
      val key = (0 until MinHash.rowsPerBand)
        .map(r => s"CAST(mh_${b * MinHash.rowsPerBand + r} AS VARCHAR)")
        .mkString(" || '-' || ")
      s"SELECT $id, $b AS band, $key AS bkey FROM mh"
    }.mkString("\n  UNION ALL\n  ")
    // fragments substituted post-stripMargin, single pass (ADVICE r8)
    graft.SqlTemplate.fill(s"""WITH tk AS (
       |  SELECT __ID__, string_split(__TEXT__, ' ') AS t FROM __TABLE__),
       |sh AS (
       |  SELECT __ID__, list_distinct(
       |    [t[i]||' '||t[i+1]||' '||t[i+2] for i in generate_series(1, len(t)-2)]) AS s
       |  FROM tk WHERE len(t) >= 3),
       |hv AS (
       |  SELECT __ID__, list_sort(list_distinct(
       |    list_transform(s, x -> ('0x'||substr(md5(x),1,8))::BIGINT))) AS h
       |  FROM sh),
       |mh AS (
       |  SELECT __ID__,
       |       __MHEXPRS__
       |  FROM hv),
       |bands AS (
       |  __BANDSELECTS__),
       |cand AS (
       |  SELECT DISTINCT tr.__ID__ AS train_id, ev.__ID__ AS eval_id
       |  FROM bands tr JOIN bands ev
       |    ON tr.band = ev.band AND tr.bkey = ev.bkey
       |  WHERE tr.__ID__ % $evalMod <> 0 AND ev.__ID__ % $evalMod = 0),
       |jac AS (
       |  SELECT train_id, eval_id,
       |         len(list_intersect(a.h, b.h)) / len(list_distinct(a.h || b.h)) AS j
       |  FROM cand
       |  JOIN hv a ON cand.train_id = a.__ID__
       |  JOIN hv b ON cand.eval_id = b.__ID__)
       |SELECT train_id AS __ID__, count(*) AS n_eval_matches,
       |       round(max(j), 4) AS max_jaccard
       |FROM jac WHERE j >= $threshold
       |GROUP BY 1 ORDER BY 1""".stripMargin,
      "__ID__" -> id, "__TEXT__" -> text, "__TABLE__" -> table,
      "__MHEXPRS__" -> mhExprs, "__BANDSELECTS__" -> bandSelects)
  }

  /** The REVERSE direction of [[overlaps]]: per EVAL doc, how much of
    * it the training corpus already contains — the generalization-vs-
    * contamination table read before trusting a benchmark score (an
    * eval doc with coverage ~1 is memorizable; ~0 is genuinely held
    * out). Output: (evalIdCol, n_grams, n_covered, coverage).
    *
    * Scale shape: the eval gram set broadcasts into ONE train scan
    * (the [[overlaps]] argument); only MATCHED grams — bounded by the
    * eval side — come back, distinct to a tiny frame, and the per-eval
    * join runs on eval-sized rows. The train corpus never shuffles. */
  def evalCoverage(train: DataFrame, eval: DataFrame, idCol: String,
                   textCol: String, n: Int = 3): DataFrame = {
    val evalRows = eval
      .select(col(idCol).as("eval_id"),
        explode(MinHash.hashedShingles(col(textCol), n)).as("g"))
    val covered = train
      .select(explode(MinHash.hashedShingles(col(textCol), n)).as("g"))
      .join(broadcast(evalRows.select("g").distinct()), "g")
      .select("g").distinct()
      .withColumn("hit", lit(1L))
    evalRows.join(broadcast(covered), Seq("g"), "left")
      .groupBy(col("eval_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("hit"), lit(0L))).as("n_covered"))
      .withColumn("coverage",
        round(col("n_covered").cast("double") / col("n_grams"), 4))
  }

  /** DuckDB mirror of [[evalCoverage]] with eval = `$id % evalMod = 0`. */
  def evalCoverageSql(table: String, id: String, text: String,
                      n: Int, evalMod: Int): String = {
    val gram = (0 until n).map(o => s"t[i+$o]").mkString(" || ' ' || ")
    graft.SqlTemplate.fill(s"""WITH tk AS (
       |  SELECT __ID__, string_split(__TEXT__, ' ') AS t FROM __TABLE__),
       |hv AS (
       |  SELECT __ID__, list_distinct(list_transform(
       |    [__GRAM__ for i in generate_series(1, len(t)-${n - 1})],
       |    x -> ('0x'||substr(md5(x),1,8))::BIGINT)) AS h
       |  FROM tk WHERE len(t) >= $n),
       |eval_rows AS (
       |  SELECT __ID__ AS eval_id, unnest(h) AS g
       |  FROM hv WHERE __ID__ % $evalMod = 0),
       |covered AS (
       |  SELECT DISTINCT g FROM (
       |    SELECT unnest(h) AS g FROM hv WHERE __ID__ % $evalMod <> 0) tr
       |  JOIN (SELECT DISTINCT g FROM eval_rows) eg USING (g))
       |SELECT e.eval_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN c.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_covered,
       |  round(sum(CASE WHEN c.g IS NOT NULL THEN 1 ELSE 0 END)
       |        / count(*), 4) AS coverage
       |FROM eval_rows e LEFT JOIN covered c ON e.g = c.g
       |GROUP BY 1 ORDER BY 1""".stripMargin,
      "__ID__" -> id, "__TEXT__" -> text, "__TABLE__" -> table,
      "__GRAM__" -> gram)
  }

  /** DuckDB form of [[overlaps]] with eval = `$id % evalMod = 0` (the
    * query's simulated held-out split) — same shingle rule, same hash,
    * same threshold, generated from the same constants. */
  def oracleSql(table: String, id: String, text: String,
                n: Int, minOverlap: Int, evalMod: Int): String = {
    val gram = (0 until n).map(o => s"t[i+$o]").mkString(" || ' ' || ")
    graft.SqlTemplate.fill(s"""WITH tk AS (
       |  SELECT __ID__, string_split(__TEXT__, ' ') AS t FROM __TABLE__),
       |hv AS (
       |  SELECT __ID__, list_distinct(list_transform(
       |    [__GRAM__ for i in generate_series(1, len(t)-${n - 1})],
       |    x -> ('0x'||substr(md5(x),1,8))::BIGINT)) AS h
       |  FROM tk WHERE len(t) >= $n),
       |eval_grams AS (
       |  SELECT DISTINCT unnest(h) AS g FROM hv WHERE __ID__ % $evalMod = 0),
       |train AS (
       |  SELECT __ID__, unnest(h) AS g FROM hv WHERE __ID__ % $evalMod <> 0)
       |SELECT train.__ID__, count(*) AS n_overlap
       |FROM train JOIN eval_grams USING (g)
       |GROUP BY 1 HAVING count(*) >= $minOverlap
       |ORDER BY 1""".stripMargin,
      "__ID__" -> id, "__TEXT__" -> text, "__TABLE__" -> table,
      "__GRAM__" -> gram)
  }

  /** EMBEDDING-space decontamination (C109) — the semantic sibling of
    * the n-gram [[overlaps]] check: a paraphrased or translated
    * benchmark leak shares no n-grams but sits next to the benchmark in
    * embedding space, so flag corpus vectors whose cosine against ANY
    * benchmark vector reaches `threshold`. Output per contaminated
    * vector: `n_bench_hits` (how many benchmark items it matches) and
    * `max_cos` — enough to rank a removal sweep.
    *
    * Scale shape: benchmarks are tiny next to a 100 TB corpus — the
    * benchmark side BROADCASTS (norms precomputed) and the corpus stays
    * one scan-local pass of |bench| fused dot products per row; only
    * matching rows reach the per-vector count shuffle. Never a
    * corpus × corpus join; if the "benchmark" ever rivals the corpus,
    * compose [[AnnLsh]] banding exactly as the near-dup path does.
    * The cosine crosses the engine boundary as an INTEGER e4 ladder
    * (`max_cos_e4 = round(max_cos·10⁴)` as BIGINT, the score_e9 /
    * recall_e4 discipline) — never a raw rounded DOUBLE, whose
    * formatting can diverge cross-engine at half boundaries. */
  def embeddingContamination(corpus: DataFrame, bench: DataFrame,
                             idCol: String, vecCol: String,
                             threshold: Double): DataFrame = {
    import graft.functions.Vectors
    val c = corpus.select(col(idCol).as("vec_id"),
        Vectors.toDouble(col(vecCol)).as("__v"))
      .withColumn("__n", Vectors.norm(col("__v")))
    val b = bench.select(col(idCol).as("__bid"),
        Vectors.toDouble(col(vecCol)).as("__bv"))
      .withColumn("__bn", Vectors.norm(col("__bv")))
    c.crossJoin(broadcast(b))
      .withColumn("cos_raw", Vectors.cosineWithNorms(
        col("__v"), col("__bv"), col("__n"), col("__bn")))
      .where(col("cos_raw") >= threshold)
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_bench_hits"),
        // floor(x*1e4 + 0.5), mirrored LITERALLY in the SQL twin: both
        // engines floor the same double, so the HALF_UP-vs-banker's
        // divergence of round() at exact .5 boundaries cannot occur
        // (the scaled-integer discipline, see memory: round() is
        // unmirrorable across engines at half boundaries).
        floor(max(col("cos_raw")) * 10000 + 0.5).cast("long")
          .as("max_cos_e4"))
  }

  /** DuckDB mirror of [[embeddingContamination]] over the embeddings
    * table split by `benchPred` (benchmark) / its complement (corpus). */
  def embeddingContaminationSql(table: String, id: String, vec: String,
                                benchPred: String,
                                threshold: Double): String = {
    val cos = "list_dot_product(c.v, b.v) / " +
      "(sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v)))"
    s"""WITH e AS (SELECT $id AS vec_id, $vec::DOUBLE[] AS v FROM $table),
       |b AS (SELECT * FROM e WHERE $benchPred),
       |c AS (SELECT * FROM e WHERE NOT ($benchPred)),
       |s AS (
       |  SELECT c.vec_id, $cos AS cos_raw
       |  FROM c CROSS JOIN b
       |  WHERE $cos >= $threshold)
       |SELECT vec_id, count(*) AS n_bench_hits,
       |       CAST(floor(max(cos_raw) * 10000 + 0.5) AS BIGINT) AS max_cos_e4
       |FROM s GROUP BY 1""".stripMargin
  }
}
