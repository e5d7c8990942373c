package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** LSH-bucketed approximate nearest neighbours (SURVEY.md §2.C7) —
  * the scale path beside the exact [[Similarity.annTopK]] baseline.
  *
  * Random-hyperplane LSH: 16 fixed hyperplanes → 16 sign bits → 4 bands
  * of 4 bits. A probe only meets corpus vectors sharing at least one
  * band key, via a plain EQUI-join on (band, key) — each probe touches
  * ~1 - (1 - 2^-4)^4 ≈ 23% of a uniformly-bucketed corpus instead of all
  * of it, and the join is shuffle-partitioned by band key, never a
  * cartesian. Recall < 1 by design; [[graft.DocsOpsSpec]] asserts the
  * measured recall against the exact baseline.
  *
  * The hyperplanes are deterministic (seeded) literals baked into both
  * the Spark plan and the generated DuckDB oracle — single source of
  * truth, no RNG at execution time.
  */
object AnnLsh {

  val dims = 64
  val numPlanes = 16
  val numBands = 4
  val bitsPerBand = 4

  /** Seeded Gaussian hyperplanes: deterministic across runs/engines. */
  val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(numPlanes)(Seq.fill(dims)(rnd.nextGaussian()))
  }

  private def planeLit(p: Seq[Double]): Column = array(p.map(lit(_)): _*)

  /** The `numBands` band keys (each a 0..15 int) for a double vector. */
  def bandKeys(vec: Column): Seq[Column] =
    (0 until numBands).map { b =>
      (0 until bitsPerBand).map { i =>
        val dot = Vectors.dot(vec, planeLit(planes(b * bitsPerBand + i)))
        when(dot >= 0, lit(1 << i)).otherwise(lit(0))
      }.reduce(_ + _)
    }

  /** One row per (id, band) with the band key, vector carried along. */
  private def banded(e: DataFrame, idAs: String, vecAs: String): DataFrame = {
    val keys = bandKeys(col(vecAs))
    val bandStructs = keys.zipWithIndex.map { case (k, b) =>
      struct(lit(b).as("band"), k.as("bkey"))
    }
    e.select(col(idAs), col(vecAs), explode(array(bandStructs: _*)).as("bk"))
      .select(col(idAs), col(vecAs),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** Approximate top-k: candidates from the band equi-join, exact cosine
    * on candidates only, per-probe rank. Output mirrors
    * [[Similarity.annTopK]] (probe_id, rank, neighbor_id, cos_sim). */
  def topK(corpus: DataFrame, probes: DataFrame, idCol: String,
           vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = banded(
      corpus.select(col(idCol).as("neighbor_id"),
        Vectors.toDouble(col(vecCol)).as("vc")), "neighbor_id", "vc")
      .withColumn("nc", Vectors.norm(col("vc")))
    val p = banded(
      probes.select(col(idCol).as("probe_id"),
        Vectors.toDouble(col(vecCol)).as("vp")), "probe_id", "vp")
      .withColumn("np", Vectors.norm(col("vp")))
    val cand = c.join(p, Seq("band", "bkey"))
      .withColumn("cos_raw", Vectors.cosineWithNorms(
        col("vp"), col("vc"), col("np"), col("nc")))
      // a pair can match in several bands: collapse with a partial-agg
      // groupBy (cos is identical for every copy)
      .groupBy(col("probe_id"), col("neighbor_id"))
      .agg(first(col("cos_raw")).as("cos_raw"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(round(col("cos_raw"), 9).desc, col("neighbor_id"))
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** LSH-accelerated near-dup pairs — the scale path for the exact
    * all-pairs [[Similarity.neardupPairs]] baseline: candidates from the
    * band equi-join (a pair is compared only if it shares a band key),
    * exact cosine filter on candidates. Recall < 1 by design; asserted
    * against the exact baseline in DocsOpsSpec. */
  def neardupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val bands = banded(
      emb.select(col(idCol).as("id"), Vectors.toDouble(col(vecCol)).as("v")),
      "id", "v")
      .withColumn("n", Vectors.norm(col("v")))
    // cosine + threshold BEFORE the pair-dedup shuffle: every band copy
    // of a pair has the same cosine, so the filter drops non-dups while
    // rows still carry vectors partition-locally; the groupBy then
    // shuffles only (id_a, id_b, cos) for the few survivors.
    bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        Vectors.cosineWithNorms(
          col("x.v"), col("y.v"), col("x.n"), col("y.n")).as("cos_raw"))
      .where(col("cos_raw") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("cos_raw")).as("cos_raw"))
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** DuckDB oracle for [[neardupPairs]] over the embeddings table. */
  def neardupOracleSql(table: String, threshold: Double): String = {
    def keySql(b: Int): String =
      (0 until bitsPerBand).map { i =>
        val plane = planes(b * bitsPerBand + i).mkString("[", ", ", "]")
        s"CASE WHEN list_dot_product(v, $plane) >= 0 THEN ${1 << i} ELSE 0 END"
      }.mkString("(", " + ", ")")
    val bandSelects = (0 until numBands)
      .map(b => s"SELECT vec_id, v, $b AS band, ${keySql(b)} AS bkey FROM e")
      .mkString("\n  UNION ALL\n  ")
    val cos = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM $table),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey AND x.vec_id < y.vec_id)
       |SELECT id_a, id_b, round($cos, 4) AS cos_sim
       |FROM cand JOIN e a ON cand.id_a = a.vec_id
       |          JOIN e b ON cand.id_b = b.vec_id
       |WHERE $cos >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** DuckDB oracle for [[topK]], generated from the same plane literals. */
  def oracleSql(table: String, probeMaxId: Long, k: Int): String = {
    def keySql(b: Int): String =
      (0 until bitsPerBand).map { i =>
        val plane = planes(b * bitsPerBand + i).mkString("[", ", ", "]")
        s"CASE WHEN list_dot_product(v, $plane) >= 0 THEN ${1 << i} ELSE 0 END"
      }.mkString("(", " + ", ")")
    val bandSelects = (0 until numBands)
      .map(b => s"SELECT vec_id, v, $b AS band, ${keySql(b)} AS bkey FROM e")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH e AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS v FROM $table),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
       |         p.v AS vp, c.v AS vc
       |  FROM bands p JOIN bands c
       |    ON p.band = c.band AND p.bkey = c.bkey
       |  WHERE p.vec_id < $probeMaxId AND c.vec_id >= $probeMaxId),
       |scored AS (
       |  SELECT probe_id, neighbor_id,
       |         list_dot_product(vp, vc)
       |           / (sqrt(list_dot_product(vp, vp)) * sqrt(list_dot_product(vc, vc))) AS cos_raw
       |  FROM cand),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |            ORDER BY round(cos_raw, 9) DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT probe_id, rank, neighbor_id, round(cos_raw, 4) AS cos_sim
       |FROM r WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin
  }
}
