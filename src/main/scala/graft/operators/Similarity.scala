package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Similarity search over an embedding column (`array<float>`).
  *
  * Plan shapes at scale (SURVEY.md §5):
  *  - [[annTopK]]: the probe set is broadcast (it is small by contract);
  *    Spark plans a BroadcastNestedLoopJoin — ONE streaming pass over the
  *    corpus, no shuffle of corpus rows. The row_number(<=k) filter is
  *    rewritten by Catalyst's InferWindowGroupLimit into a partial top-k
  *    per map partition BEFORE the (tiny, k·|probes|-row) final shuffle.
  *  - [[neardupPairs]]: exact all-pairs — the CORRECTNESS baseline only.
  *    O(n²) by definition; at corpus scale use the LSH-bucketed variant
  *    ([[AnnLsh]]) whose candidate generation is a band equi-join.
  */
object Similarity {

  /** Default corpus-size bound for [[neardupPairs]]: ~100k rows = ~5e9
    * pairwise evaluations, the edge of what an exact baseline should
    * ever be asked to do. Beyond it the operator REFUSES at runtime
    * rather than silently launching an n² job. */
  val DefaultMaxExactRows = 100000L

  /** All pairs (a < b) with cosine >= threshold. Exact baseline; the LSH
    * path is the 100 TB shape. Norms are computed once per vector (not
    * per pair), and the pairwise dot is the codegen'd [[Vectors.dot]] —
    * same IEEE result, ~n× less work than the naive per-pair cosine.
    *
    * `maxRows` is the n² guard (the cap/assert treatment [[SimHash]]'s
    * `maxBucket` gives buckets): the plan carries a broadcast 1-row
    * count with an `assert_true`, so a corpus larger than `maxRows`
    * fails fast at broadcast-build time — before any pairwise work —
    * with a pointer to the [[AnnLsh]] scale path. In-plan (not a
    * driver-side count action) so the guard costs one id-only partial
    * agg and the operator stays a single Catalyst plan. */
  def neardupPairs(emb: DataFrame, idCol: String, vecCol: String,
                   threshold: Double,
                   maxRows: Long = DefaultMaxExactRows): DataFrame = {
    val e = emb.select(col(idCol), Vectors.toDouble(col(vecCol)).as("__v"))
      .withColumn("__n", Vectors.norm(col("__v")))
    val guard = e.agg(count(lit(1)).as("__cnt"))
      .select(assert_true(col("__cnt") <= maxRows,
        concat(lit("Similarity.neardupPairs is the exact all-pairs baseline; refusing "),
          col("__cnt").cast("string"),
          lit(s" rows (> maxRows=$maxRows). Use AnnLsh.neardupPairs at scale " +
            "or raise maxRows explicitly."))).as("__guard"))
    val a = e.select(col(idCol).as("id_a"), col("__v").as("__va"), col("__n").as("__na"))
    val b = e.select(col(idCol).as("id_b"), col("__v").as("__vb"), col("__n").as("__nb"))
    a.crossJoin(broadcast(guard))
      // assert_true yields NULL on success; referencing it in a filter
      // keeps the assertion alive through column pruning
      .where(col("__guard").isNull)
      .join(b, col("id_a") < col("id_b"))
      .withColumn("cos_raw", Vectors.cosineWithNorms(
        col("__va"), col("__vb"), col("__na"), col("__nb")))
      .where(col("cos_raw") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** k-NN majority-vote classification: each probe gets the label held by
    * most of its k nearest corpus neighbours (cosine), ties going to the
    * smallest label. Same plan as [[annTopK]] (broadcast probes, one
    * corpus pass, partial top-k) plus a label join against the k·|probes|
    * candidate rows — the per-probe vote is a tiny grouped count, never a
    * second corpus pass. Votes group on the RAW label column (any
    * orderable type — casting here would collapse e.g. double labels
    * 1.2 and 1.9 into one vote bucket); `pred_label` keeps that type,
    * so cast at the call site if a specific output type is needed.
    */
  def knnClassify(corpus: DataFrame, probes: DataFrame, idCol: String,
                  vecCol: String, labelCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val topk = annTopK(corpus, probes, idCol, vecCol, k)
    val labels = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("__lbl"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(desc("n_votes"), col("__lbl"))
    topk.join(labels, "neighbor_id")
      .groupBy(col("probe_id"), col("__lbl"))
      .agg(count(lit(1)).as("n_votes"))
      .withColumn("__r", row_number().over(w))
      .where(col("__r") === 1)
      .select(col("probe_id"), col("__lbl").as("pred_label"),
        col("n_votes"))
  }

  /** Hard-negative mining for contrastive training: the k corpus items
    * most similar to each probe that carry a DIFFERENT label. Same
    * broadcast-probe single-corpus-pass plan as [[annTopK]]; the
    * label-mismatch filter runs before the window, so the partial top-k
    * (InferWindowGroupLimit) keeps only k rows per (probe, partition). */
  def hardNegatives(corpus: DataFrame, probes: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Labels stay in their raw type: the mismatch filter must see 1.2
    // and 1.9 as DIFFERENT labels, which a cast-to-long would collapse.
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(labelCol).as("neg_label"),
      Vectors.toDouble(col(vecCol)).as("__vc"))
      .withColumn("__nc", Vectors.norm(col("__vc")))
    val p = probes.select(col(idCol).as("probe_id"),
      col(labelCol).as("probe_label"),
      Vectors.toDouble(col(vecCol)).as("__vp"))
      .withColumn("__np", Vectors.norm(col("__vp")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(round(col("cos_raw"), 9).desc, col("neighbor_id"))
    c.crossJoin(broadcast(p))
      .where(col("neg_label") =!= col("probe_label"))
      .withColumn("cos_raw", Vectors.cosineWithNorms(
        col("__vp"), col("__vc"), col("__np"), col("__nc")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("probe_label"), col("rank"),
        col("neighbor_id"), col("neg_label"),
        round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** All pairs (a < b) with cosine >= threshold WITHIN each cluster —
    * the SemDeDup shape (Abbas et al. 2023): a coarse quantizer (k-means
    * assignment) scopes the quadratic pair search to cluster members, so
    * the join is an equi-join on the cluster id and the pair count is
    * Σ|cluster|², not |corpus|². At 100 TB, k is sized so clusters stay
    * ~1e4-1e5 rows; `maxCluster` is the in-plan guard (the same
    * treatment as [[neardupPairs]]' `maxRows` and SimHash's
    * `maxBucket`): if ANY cluster exceeds it, the job fails fast at
    * broadcast-build time — before the quadratic join — telling the
    * caller to raise k, because a silent hot cell would quietly turn
    * the equi-join back into n². */
  def neardupPairsWithin(emb: DataFrame, idCol: String, vecCol: String,
                         clusterCol: String, threshold: Double,
                         maxCluster: Long = 100000L): DataFrame = {
    val e = emb.select(col(clusterCol).cast("long").as("__cl"),
      col(idCol), Vectors.toDouble(col(vecCol)).as("__v"))
      .withColumn("__n", Vectors.norm(col("__v")))
    val guard = e.groupBy(col("__cl")).agg(count(lit(1)).as("__sz"))
      .agg(max(col("__sz")).as("__max"))
      .select(assert_true(col("__max") <= maxCluster,
        concat(lit("Similarity.neardupPairsWithin: largest cluster has "),
          col("__max").cast("string"),
          lit(s" rows (> maxCluster=$maxCluster); raise k on the " +
            "quantizer or maxCluster explicitly — a hot cell makes the " +
            "cluster-scoped join quadratic."))).as("__guard"))
    val a = e.crossJoin(broadcast(guard))
      .where(col("__guard").isNull)
      .select(col("__cl"), col(idCol).as("id_a"),
        col("__v").as("__va"), col("__n").as("__na"))
    val b = e.select(col("__cl").as("__clb"), col(idCol).as("id_b"),
      col("__v").as("__vb"), col("__n").as("__nb"))
    a.join(b, col("__cl") === col("__clb") && col("id_a") < col("id_b"))
      .withColumn("cos_raw", Vectors.cosineWithNorms(
        col("__va"), col("__vb"), col("__na"), col("__nb")))
      .where(col("cos_raw") >= threshold)
      .select(col("__cl").as("cluster"), col("id_a"), col("id_b"),
        round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** Exact top-k neighbours of each probe over the corpus.
    *
    * Ordering is on round(cos, 9) with the neighbour id as tiebreak: the
    * 9-decimal round absorbs cross-engine float-fold noise (~1e-15) while
    * never conflating genuinely different similarities.
    */
  def annTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(idCol).as("neighbor_id"),
      Vectors.toDouble(col(vecCol)).as("__vc"))
      .withColumn("__nc", Vectors.norm(col("__vc")))
    val p = probes.select(col(idCol).as("probe_id"),
      Vectors.toDouble(col(vecCol)).as("__vp"))
      .withColumn("__np", Vectors.norm(col("__vp")))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(round(col("cos_raw"), 9).desc, col("neighbor_id"))
    c.crossJoin(broadcast(p))
      .withColumn("cos_raw", Vectors.cosineWithNorms(
        col("__vp"), col("__vc"), col("__np"), col("__nc")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        round(col("cos_raw"), 4).as("cos_sim"))
  }
}
