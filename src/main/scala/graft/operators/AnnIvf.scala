package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** IVF-style approximate nearest neighbours (SURVEY.md §2.C15) — the
  * second scale path beside hyperplane LSH ([[AnnLsh]]).
  *
  * Coarse quantizer = per-list centroids. Here the inverted lists are
  * the `label` clusters the corpus already carries (a production system
  * would k-means them; the assign/probe machinery is identical).
  * Centroid components are reconstructed from EXACT fixed-point
  * (scale-1e6) integer sums — deterministic in any engine and any
  * aggregation order, which is what makes the DuckDB oracle possible.
  *
  * Query plan shape: probes × centroids is a broadcast nested-loop over
  * |lists| rows (tiny); the corpus is touched ONLY through an equi-join
  * on the selected list ids — each probe scans nprobe/|lists| of the
  * corpus, and the final top-k is a WindowGroupLimit partial rank.
  */
object AnnIvf {

  /** Per-list centroids as `(label, centroid array<double>)`, from exact
    * scaled-integer component sums. */
  def centroids(emb: DataFrame, labelCol: String, vecCol: String): DataFrame =
    emb
      .select(col(labelCol).cast("long").as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(
        sum(floor(col("x").cast("double") * 1000000).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("dim"), col("s"), col("n")))).as("comps"))
      .select(col("label"),
        transform(col("comps"), c =>
          c.getField("s").cast("double") / (c.getField("n") * lit(1000000.0)))
          .as("centroid"))

  /** Approximate top-k: each probe ranks the `nprobe` nearest centroids,
    * then searches only those inverted lists. Output mirrors
    * [[Similarity.annTopK]] (probe_id, rank, neighbor_id, cos_sim). */
  def topK(corpus: DataFrame, probes: DataFrame, idCol: String,
           vecCol: String, labelCol: String, k: Int, nprobe: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cent = centroids(corpus, labelCol, vecCol)
    val p = probes.select(col(idCol).as("probe_id"),
      Vectors.toDouble(col(vecCol)).as("vp"))
      .withColumn("np", Vectors.norm(col("vp")))
    // probe → nprobe nearest lists (tiny cross join over |lists| rows)
    val wSel = Window.partitionBy(col("probe_id"))
      .orderBy(round(col("ccos"), 9).desc, col("label"))
    val selected = p.crossJoin(broadcast(cent))
      .withColumn("ccos", Vectors.cosine(col("vp"), col("centroid")))
      .withColumn("crn", row_number().over(wSel))
      .where(col("crn") <= nprobe)
      .select(col("probe_id"), col("vp"), col("np"), col("label"))
    // search only the selected lists — equi-join on the list id
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).cast("long").as("label"),
      Vectors.toDouble(col(vecCol)).as("vc"))
      .withColumn("nc", Vectors.norm(col("vc")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(round(col("cos_raw"), 9).desc, col("neighbor_id"))
    selected.join(c, "label")
      .withColumn("cos_raw", Vectors.cosineWithNorms(
        col("vp"), col("vc"), col("np"), col("nc")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cos_raw"), 4).as("cos_sim"))
  }

  private def cosSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"

  /** DuckDB oracle for [[topK]] over the embeddings table with
    * `vec_id < probeMaxId` probes (corpus = the rest). */
  def oracleSql(table: String, probeMaxId: Long, k: Int, nprobe: Int): String =
    s"""WITH e AS (
       |  SELECT vec_id, label::BIGINT AS label, embedding::DOUBLE[] AS v
       |  FROM $table),
       |corpus AS (SELECT * FROM e WHERE vec_id >= $probeMaxId),
       |comp AS (
       |  SELECT label, (ord-1)::BIGINT AS dim,
       |         sum(CAST(floor(x*1000000) AS BIGINT)) AS s, count(*) AS n
       |  FROM (SELECT label::BIGINT AS label, unnest(embedding::DOUBLE[]) AS x,
       |               generate_subscripts(embedding, 1) AS ord
       |        FROM $table WHERE vec_id >= $probeMaxId) t
       |  GROUP BY 1, 2),
       |cent AS (
       |  SELECT label, list(s / (n * 1000000.0) ORDER BY dim) AS c
       |  FROM comp GROUP BY label),
       |p AS (SELECT vec_id AS probe_id, v FROM e WHERE vec_id < $probeMaxId),
       |sel AS (
       |  SELECT probe_id, v, label FROM (
       |    SELECT p.probe_id, p.v, cent.label,
       |           row_number() OVER (PARTITION BY p.probe_id
       |             ORDER BY round(${cosSql("p.v", "cent.c")}, 9) DESC, cent.label) AS crn
       |    FROM p CROSS JOIN cent) x
       |  WHERE crn <= $nprobe),
       |scored AS (
       |  SELECT sel.probe_id, corpus.vec_id AS neighbor_id,
       |         ${cosSql("sel.v", "corpus.v")} AS cos_raw
       |  FROM sel JOIN corpus USING (label)),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |            ORDER BY round(cos_raw, 9) DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT probe_id, rank, neighbor_id, round(cos_raw, 4) AS cos_sim
       |FROM r WHERE rank <= $k ORDER BY probe_id, rank""".stripMargin
}
