package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** DataFrame-native Lloyd k-means over an embedding column — the
  * quantizer-refinement step for IVF ANN ([[AnnIvf]] seeds from existing
  * cluster labels; this improves them).
  *
  * Everything is deterministic and declarative:
  *  - init = per-label centroids (exact fixed-point sums, [[AnnIvf.centroids]]);
  *  - assignment: corpus × broadcast(k centroids) — a tiny nested-loop
  *    over k rows per vector; argmin via `min_by` with a (dist, cluster)
  *    struct so ties break toward the smaller cluster id;
  *  - update: exact scale-1e6 integer component sums (order-independent).
  * Squared L2 uses |a|² − 2a·c + |c|² with the codegen'd dot kernel and
  * per-vector norms computed once.
  *
  * Per iteration: one broadcast of k·d doubles, one shuffle of |corpus|
  * (id, cluster) pairs, one component-sum shuffle of k·d groups — scales
  * to any corpus size. The iteration loop `localCheckpoint`s the (tiny,
  * k-row) centroid frame each pass: without it every iteration's plan
  * nests the previous one, so analysis/optimization cost grows
  * super-linearly and ~50 iterations blow up plan compilation long
  * before the data is the problem. Checkpointing k·d doubles per
  * iteration truncates lineage for ~zero storage cost.
  */
object KMeans {

  /** (id, cluster) assignment of each vector to its nearest centroid. */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame): DataFrame = {
    val e = emb.select(col(idCol),
      Vectors.toDouble(col(vecCol)).as("__v"))
      .withColumn("__n2", Vectors.dot(col("__v"), col("__v")))
    val c = centroids.select(col("label").as("cluster"), col("centroid"))
      .withColumn("__c2", Vectors.dot(col("centroid"), col("centroid")))
    e.crossJoin(broadcast(c))
      .withColumn("__dist",
        col("__n2") - lit(2.0) * Vectors.dot(col("__v"), col("centroid"))
          + col("__c2"))
      .groupBy(col(idCol))
      .agg(min_by(col("cluster"), struct(col("__dist"), col("cluster")))
        .as("cluster"))
  }

  /** Deterministic farthest-first (Gonzalez k-center) seeding — the
    * distributed-friendly stand-in for k-means++: the classic ++ rule
    * samples each seed ∝ D²(x) and is inherently sequential AND random;
    * farthest-first keeps the same "spread the seeds out" geometry with
    * no randomness (seed 0 = the min-id vector; each next seed = the
    * point farthest from every chosen seed, min-id tiebreak), so runs
    * are reproducible across engines and cluster layouts.
    *
    * Scale shape: each of the k rounds is one corpus scan — a broadcast
    * of the ≤k chosen centroids, a per-row min distance, and a
    * TakeOrdered(1) reduction (no global sort materializes; only ONE
    * row reaches the driver per round). The chosen-seed frame is
    * `localCheckpoint`ed per round, like [[fit]]'s loop. Use for
    * moderate k (IVF nlist seeding); for k in the many thousands,
    * fewer-pass oversampling (k-means||, Bahmani et al. VLDB'12) is the
    * public scale path. */
  def initFarthest(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val e = emb.select(col(idCol).as("__id"),
        Vectors.toDouble(col(vecCol)).as("__v"))
      .withColumn("__n2", Vectors.dot(col("__v"), col("__v")))
    var cents = e.orderBy(col("__id")).limit(1)
      .select(lit(0L).as("label"), col("__v").as("centroid"))
      .localCheckpoint()
    for (j <- 1 until k) {
      val c = cents
        .withColumn("__c2", Vectors.dot(col("centroid"), col("centroid")))
      val next = e.crossJoin(broadcast(c))
        .withColumn("__dist",
          col("__n2") - lit(2.0) * Vectors.dot(col("__v"), col("centroid"))
            + col("__c2"))
        .groupBy(col("__id"))
        .agg(min(col("__dist")).as("__dmin"), first(col("__v")).as("__v"))
        .orderBy(col("__dmin").desc, col("__id")).limit(1)
        .select(lit(j.toLong).as("label"), col("__v").as("centroid"))
      cents = cents.unionAll(next).localCheckpoint()
    }
    cents
  }

  /** Diverse-subset selection — the Gonzalez k-center greedy surfaced
    * as a SELECTION operator (coreset / few-shot exemplar / eval-probe
    * picking: k vectors that 2-approximate the minimax coverage
    * radius): seed = min-id vector, each next pick = the vector whose
    * distance to every prior pick is largest (min-id tiebreak).
    * Distances snap to round(9) BEFORE the running min / argmax (the
    * C18 kmScore recipe), so selection is bit-stable cross-engine and
    * the oracle can unroll the same k rounds as CTEs.
    *
    * Scale shape: each round is ONE scan of the corpus-sized
    * (id, v, dmin) frame — the newest pick broadcasts (1 row), the
    * running min is a scan-local `least`, the argmax a TakeOrdered(1)
    * reduction (one row to the driver per round — the KMeans-scalar
    * class); the frame localCheckpoints per round so lineage stays flat.
    * k corpus scans total — the greedy's inherent cost; for k beyond
    * ~tens, over-sample-then-refine (k-means||) is the public recipe. */
  def selectDiverse(emb: DataFrame, idCol: String, vecCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val e = emb.select(col(idCol).as("__id"),
        Vectors.toDouble(col(vecCol)).as("__v"))
      .withColumn("__n2", Vectors.dot(col("__v"), col("__v")))
    var picked = e.orderBy(col("__id")).limit(1)
      .select(lit(0L).as("sel_round"), col("__id"), col("__v"))
      .localCheckpoint()
    // (id, v, n2, dmin): running min of round(9) distances to picks
    var frame: DataFrame = null
    for (j <- 1 until k) {
      val latest = broadcast(
        picked.where(col("sel_round") === (j - 1))
          .select(col("__v").as("__c"))
          .withColumn("__c2", Vectors.dot(col("__c"), col("__c"))))
      def dcur = round(col("__n2") - lit(2.0) * Vectors.dot(col("__v"),
        col("__c")) + col("__c2"), 9)
      frame = (if (frame == null)
          e.crossJoin(latest).select(col("__id"), col("__v"), col("__n2"),
            dcur.as("__dmin"))
        else
          frame.crossJoin(latest).select(col("__id"), col("__v"),
            col("__n2"), least(col("__dmin"), dcur).as("__dmin")))
        .localCheckpoint()
      val next = frame.orderBy(col("__dmin").desc, col("__id")).limit(1)
        .select(lit(j.toLong).as("sel_round"), col("__id"), col("__v"))
      picked = picked.unionAll(next).localCheckpoint()
    }
    picked.select(col("sel_round"), col("__id").as("vec_id"))
  }

  /** DuckDB mirror of [[selectDiverse]] — the k greedy rounds unrolled
    * as CTEs (same round(9) snap, same (dmin DESC, id) pick rule). */
  def selectDiverseSql(table: String, id: String, vec: String,
                       k: Int): String = {
    require(k >= 1)
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (
              |  SELECT $id AS vid,
              |         list_transform($vec, x -> CAST(x AS DOUBLE)) AS v
              |  FROM $table),
              |c0 AS (SELECT vid, v FROM e ORDER BY vid LIMIT 1)""".stripMargin
    def distSql(vExpr: String, cExpr: String) =
      s"round(list_dot_product($vExpr, $vExpr) - 2 * " +
        s"list_dot_product($vExpr, $cExpr) + " +
        s"list_dot_product($cExpr, $cExpr), 9)"
    for (j <- 1 until k) {
      val prev = if (j == 1) "e" else s"d${j - 1}"
      val dminExpr =
        if (j == 1) distSql(s"$prev.v", s"c${j - 1}.v")
        else s"least($prev.dmin, ${distSql(s"$prev.v", s"c${j - 1}.v")})"
      sb ++= s""",
                |d$j AS (
                |  SELECT $prev.vid, $prev.v, $dminExpr AS dmin
                |  FROM $prev, c${j - 1}),
                |c$j AS (SELECT vid, v FROM d$j ORDER BY dmin DESC, vid LIMIT 1)""".stripMargin
    }
    sb ++= "\n" + (0 until k).map(j =>
      s"SELECT ${j}::BIGINT AS sel_round, vid AS vec_id FROM c$j")
      .mkString("", "\nUNION ALL ", "\nORDER BY sel_round")
    sb.toString
  }

  /** `iters` Lloyd iterations from the given initial centroids.
    * Returns (assignments (id, cluster), centroids (label, centroid)). */
  def fit(emb: DataFrame, idCol: String, vecCol: String,
          init: DataFrame, iters: Int): (DataFrame, DataFrame) = {
    var cent = init
    var asg: DataFrame = null
    for (_ <- 1 to iters) {
      asg = assign(emb, idCol, vecCol, cent)
      cent = AnnIvf.centroids(
        emb.join(asg, idCol).withColumnRenamed("cluster", "__lbl"),
        "__lbl", vecCol)
        .localCheckpoint() // truncate per-iteration lineage (k rows)
    }
    (asg, cent)
  }

  /** Total within-cluster squared-L2 cost of an assignment (test /
    * convergence metric). */
  def cost(emb: DataFrame, idCol: String, vecCol: String,
           asg: DataFrame, centroids: DataFrame): Double = {
    val e = emb.select(col(idCol), Vectors.toDouble(col(vecCol)).as("__v"))
      .join(asg, idCol)
      .join(centroids.select(col("label").as("cluster"), col("centroid")),
        "cluster")
    val dist = Vectors.dot(col("__v"), col("__v")) -
      lit(2.0) * Vectors.dot(col("__v"), col("centroid")) +
      Vectors.dot(col("centroid"), col("centroid"))
    e.agg(sum(dist)).first().getDouble(0)
  }
}
