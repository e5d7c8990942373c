package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Product quantization (Jégou et al. 2011) — the compressed ANN tier
  * between int8 quantization (C38: 4× smaller, same dimensionality)
  * and IVF bucketing (C15: fewer candidates, full-width vectors): the
  * vector splits into `numSub` subspaces, each encoded as the id of
  * its nearest sub-centroid, so a d-float vector becomes `numSub`
  * small integers and query-time scoring never touches the original
  * floats — at 100 TB the ANN scan reads a few bytes per vector
  * instead of 4·d, and the fat vectors are read ONCE (at encode).
  *
  * Scoring is ADC (asymmetric distance computation) up to a
  * probe-side constant: nearest-by-L2 sub-centroid satisfies
  * argmin‖x−c‖² = argmax(2·x·c − ‖c‖²) since ‖x‖² is constant per
  * row, and the same identity makes Σ_s t_s[code_s] with
  * t_s[c] = 2·p_s·c − ‖c‖² a ranking-equivalent stand-in for the true
  * ADC distance (the dropped Σ_s‖p_s‖² is probe-constant). Both sides
  * use the repo's cross-engine ladder: round(·, 9) per subspace score,
  * scaled-e9 BIGINT table entries, integer ADC sums, leftmost-argmax
  * CASE chains — the k-means assignment parity argument
  * (queries/Docs.scala kmScoreSql) applied per subspace.
  *
  * Two codebooks share the (codebook-agnostic) encode/ADC plumbing:
  * the FORMULA codebook is a pure function of (subspace, centroid,
  * dim) — the fixed-centroid discipline the k-means oracle
  * established — so the Spark literals and the DuckDB SQL are
  * generated from the same constants and engines cannot drift; the
  * LEARNED codebook ([[learnCodebook]]) fits per-subspace Lloyd
  * k-means over a bounded deterministic sample, and PqSpec pins its
  * recall at ≥ the formula codebook's (the data-dependent literals
  * can't be mirrored in a static oracle, so the gate is the recall
  * ordering, not SQL parity). */
object Pq {

  /** Codebook: (subspace, centroidIdx) → components. */
  type Codebook = (Int, Int) => Seq[Double]

  /** Fixed sub-centroid: component j of centroid c in subspace s. */
  def centroid(numSub: Int, subDim: Int, s: Int, c: Int): Seq[Double] =
    (0 until subDim).map(j => ((s * 7 + c * 31 + j * 17) % 13 - 6) / 24.0)

  /** The formula codebook (cross-engine literal discipline). */
  def formulaCodebook(numSub: Int, subDim: Int): Codebook =
    (s, c) => centroid(numSub, subDim, s, c)

  /** LEARNED codebook: per-subspace Lloyd k-means over a bounded,
    * deterministically-drawn sample of the corpus — the production
    * quantizer-training shape (a PQ codebook is numSub·k·subDim
    * doubles, a few KB; training reads a SAMPLE, never the corpus, so
    * cost is independent of corpus size — the formula codebook then
    * drops out as literals exactly like the fixed one).
    *
    * Scale shape: ONE corpus pass — a TakeOrdered of the `sampleN`
    * smallest md5('pq:'+id) ranks (house A-Res pattern; stable across
    * runs/engines/layouts) collects the full-width sample to the
    * driver, and every subspace's Lloyd loop runs THERE on its slice
    * (the Pca/Jacobi bounded-state-to-driver rule: iterating Spark
    * jobs over a 256-row frame pays ~50 scheduler round-trips for
    * microseconds of arithmetic — measured 9.7 s → sub-second). The
    * local loop replicates the distributed [[KMeans]] semantics
    * exactly: same dist expression order, (dist, label) argmin
    * tiebreak, exact floor(x·1e6) integer mean sums (order-free), and
    * Lloyd-emptied clusters fall back to their seed centroid so the
    * codebook stays k-dense and [[encode]]'s argmax chains are
    * unchanged. */
  def learnCodebook(df: DataFrame, idCol: String, vecCol: String,
                    numSub: Int = 16, k: Int = 16, subDim: Int = 4,
                    iters: Int = 3, sampleN: Int = 256): Codebook = {
    require(sampleN >= k, "sample must hold at least k rows")
    val sample: Array[Array[Double]] = df
      .select(md5(concat_ws(":", lit("pq"), col(idCol).cast("string")))
          .as("__r"),
        Vectors.toDouble(col(vecCol)).as("__v"))
      .orderBy(col("__r")).limit(sampleN)
      .collect()
      .map(r => r.getSeq[Double](1).toArray)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val books: Array[Array[Seq[Double]]] = (0 until numSub).toArray.map { s =>
      val pts = sample.map(_.slice(s * subDim, s * subDim + subDim))
      val seeds: Array[Array[Double]] = pts.take(k).map(_.clone())
      var cents: Seq[(Int, Array[Double])] =
        seeds.zipWithIndex.map { case (c, i) => (i, c) }
      for (_ <- 1 to iters) {
        val asg = pts.map { v =>
          val n2 = dot(v, v)
          cents.map { case (l, c) =>
            (n2 - 2.0 * dot(v, c) + dot(c, c), l)
          }.min._2
        }
        cents = asg.zip(pts).groupBy(_._1).toSeq.map { case (l, vs) =>
          val n = vs.length
          l -> Array.tabulate(subDim) { j =>
            vs.map(x => math.floor(x._2(j) * 1e6).toLong).sum.toDouble /
              (n * 1e6)
          }
        }.sortBy(_._1)
      }
      val learned = cents.toMap
      Array.tabulate(k)(c => learned.getOrElse(c, seeds(c)).toSeq)
    }
    (s, c) => books(s)(c)
  }

  private def normSq(cent: Seq[Double]): Double =
    cent.foldLeft(0.0)((acc, x) => acc + x * x)

  /** Per-subspace nearest-centroid scores s0..s{k-1} for the subvector
    * at `s` — round(2·x·c − ‖c‖², 9), the L2-argmin surrogate. */
  private def subScores(vec: Column, numSub: Int, k: Int, subDim: Int,
                        s: Int, cb: Codebook): Seq[Column] =
    subScoresOn(Vectors.toDouble(slice(vec, s * subDim + 1, subDim)),
      k, s, cb)

  /** [[subScores]] over an already-prepared double subvector column —
    * the staged form [[encode]] uses so the slice is projected once. */
  private def subScoresOn(sub: Column, k: Int, s: Int,
                          cb: Codebook): Seq[Column] =
    (0 until k).map { c =>
      val cent = cb(s, c)
      round(lit(2.0) * Vectors.dot(sub, array(cent.map(lit): _*))
        - lit(normSq(cent)), 9)
    }

  /** Leftmost argmax over score columns — the code for one subspace. */
  private def argmaxChain(scores: Seq[Column]): Column =
    scores.indices.dropRight(1).foldRight(
      lit((scores.size - 1).toLong): Column) { case (c, acc) =>
      val geAllLater = (c + 1 until scores.size)
        .map(j => scores(c) >= scores(j)).reduce(_ && _)
      when(geAllLater, lit(c.toLong)).otherwise(acc)
    }

  /** Encode: (id, code0..code{numSub-1}) — a scan-local projection
    * (the one pass that reads the full-width vectors).
    *
    * Staged as THREE projections (subvectors → scores → argmax codes)
    * rather than one: the argmax CASE chain references each score
    * O(k) times, so inlining the score trees multiplies the
    * slice+dot subtree by the ~k²/2 comparisons — ~80k expression
    * nodes per row at the 16×16 default, which blows past codegen
    * limits into interpreted evaluation. With named intermediate
    * columns each score is computed ONCE per row, and CollapseProject
    * leaves multi-referenced non-trivial aliases staged. */
  def encode(df: DataFrame, idCol: String, vecCol: String,
             numSub: Int = 16, k: Int = 16, subDim: Int = 4,
             codebook: Codebook = null,
             keep: Seq[String] = Nil): DataFrame = {
    require(numSub >= 1 && k >= 2 && subDim >= 1,
      "need numSub >= 1, k >= 2, subDim >= 1")
    val cb = Option(codebook).getOrElse(formulaCodebook(numSub, subDim))
    // ONE compiled pass for all sub-codes (PqEncodeCodes): the staged
    // declarative form (encodeDeclarative, kept for the PqSpec
    // equivalence pin and as the oracle's vocabulary) generates ~k·numSub
    // score expressions whose codegen COMPILE time dominates the encode.
    val books: Array[Array[Array[Double]]] =
      Array.tabulate(numSub, k)((s, c) => cb(s, c).toArray)
    val codesCol = org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.PqEncodeCodes(
        org.apache.spark.sql.GraftSqlBridge.expression(col(vecCol)), books))
    // `keep` rides extra columns (e.g. an IVF list id) into the codes
    // artifact without a post-encode re-join against the fat corpus
    df.select(col(idCol) +: keep.map(col) :+ codesCol.as("__codes"): _*)
      .select(col(idCol) +: keep.map(col) ++: (0 until numSub).map(s =>
        element_at(col("__codes"), s + 1).as(s"code$s")): _*)
  }

  /** The staged declarative encode (subvectors → round(9) scores →
    * argmax CASE chains) — the form the DuckDB oracle mirrors; kept as
    * the equivalence baseline for the kernel (PqSpec). */
  private[graft] def encodeDeclarative(df: DataFrame, idCol: String,
      vecCol: String, numSub: Int = 16, k: Int = 16, subDim: Int = 4,
      codebook: Codebook = null): DataFrame = {
    val cb = Option(codebook).getOrElse(formulaCodebook(numSub, subDim))
    val subCols = (0 until numSub).map(s =>
      Vectors.toDouble(slice(col(vecCol), s * subDim + 1, subDim))
        .as(s"__sub$s"))
    val staged = df.select(col(idCol) +: subCols: _*)
    val scoreCols = (0 until numSub).flatMap { s =>
      subScoresOn(col(s"__sub$s"), k, s, cb).zipWithIndex.map {
        case (e, c) => e.as(s"__s_${s}_$c")
      }
    }
    val scored = staged.select(col(idCol) +: scoreCols: _*)
    val codes = (0 until numSub).map(s =>
      argmaxChain((0 until k).map(c => col(s"__s_${s}_$c")))
        .as(s"code$s"))
    scored.select(col(idCol) +: codes: _*)
  }

  /** ADC top-`topK` per probe over the ENCODED corpus: probes carry a
    * broadcast per-subspace table of scaled-e9 scores; each corpus row
    * contributes `numSub` integer table lookups — the original corpus
    * vectors are never touched at query time. */
  def annTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              vecCol: String, topK: Int, numSub: Int = 16, k: Int = 16,
              subDim: Int = 4, codebook: Codebook = null): DataFrame = {
    val cb = Option(codebook).getOrElse(formulaCodebook(numSub, subDim))
    searchCodes(encode(corpus, idCol, vecCol, numSub, k, subDim, cb),
      probes, idCol, vecCol, topK, numSub, k, subDim, cb)
  }

  /** ADC search over a PRE-ENCODED codes frame — the build-once /
    * search-many half of the index lifecycle: `codes` is the persisted
    * index artifact ((id, code0..code{numSub-1}) — a few bytes per
    * vector, written once at [[encode]] time), and every query-time
    * search reads ONLY it plus the probe set. At 100 TB re-encoding
    * per query would re-read the fat vectors; a real deployment stores
    * the codes table (bucketed/partitioned like any fact table) and
    * this entry point is the one queries hit. The codebook must be the
    * one the codes were encoded under ([[Codebook]] is a few KB of
    * literals — ship it with the artifact). */
  def searchCodes(codes: DataFrame, probes: DataFrame, idCol: String,
                  vecCol: String, topK: Int, numSub: Int = 16,
                  k: Int = 16, subDim: Int = 4,
                  codebook: Codebook = null): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = Option(codebook).getOrElse(formulaCodebook(numSub, subDim))
    val tables = (0 until numSub).map { s =>
      array(subScores(col(vecCol), numSub, k, subDim, s, cb)
        .map(sc => (sc * 1e9).cast("decimal(38,0)").cast("long")): _*)
        .as(s"t$s")
    }
    val p = probes.select(col(idCol).as("probe_id") +: tables: _*)
    val adc = (0 until numSub)
      .map(s => element_at(col(s"t$s"), (col(s"code$s") + 1).cast("int")))
      .reduce(_ + _)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(desc("adc_e9"), col(idCol))
    codes.crossJoin(broadcast(p))
      .withColumn("adc_e9", adc)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col(idCol).as("neighbor_id"),
        col("adc_e9"))
  }

  /** IVF-PQ composite index — the FAISS-style pairing of the two scale
    * levers: the IVF coarse quantizer (per-list centroids from exact
    * fixed-point sums, [[AnnIvf.centroids]]) routes each probe to its
    * `nprobe` nearest inverted lists, and PQ-ADC scores ONLY those
    * lists' codes. Search cost per query drops from |corpus| code rows
    * (flat ADC, [[searchCodes]]) to ~nprobe/|lists| of them, and each
    * scored row is still ~numSub bytes — the two reductions compose.
    * Plan shape: probe × centroid is the tiny documented broadcast
    * nested-loop (|lists| rows); the codes are touched only through an
    * EQUI-join on the list id, so the big side shuffles nothing and
    * prunes to the selected lists. Codes carry the list id from encode
    * time (`keep` — the artifact is bucketable by list, giving 100 TB
    * deployments list-partition pruning on the same parquet layout).
    * Output mirrors [[annTopK]] (probe_id, rank, neighbor_id, adc_e9);
    * recall vs flat ADC is a product of the IVF routing recall, graded
    * the same way C74 grades every tier. */
  def annTopKIvf(corpus: DataFrame, probes: DataFrame, idCol: String,
                 vecCol: String, labelCol: String, topK: Int,
                 nprobe: Int, numSub: Int = 16, k: Int = 16,
                 subDim: Int = 4, codebook: Codebook = null): DataFrame = {
    val cb = Option(codebook).getOrElse(formulaCodebook(numSub, subDim))
    val codes = encode(corpus.withColumn("__list",
        col(labelCol).cast("long")),
      idCol, vecCol, numSub, k, subDim, cb, keep = Seq("__list"))
    searchCodesIvf(codes, AnnIvf.centroids(corpus, labelCol, vecCol),
      probes, idCol, vecCol, topK, nprobe, numSub, k, subDim, cb)
  }

  /** IVF-routed ADC search over a PRE-ENCODED codes frame — the
    * build-once / search-many half of the COMPOSITE index lifecycle
    * ([[searchCodesIvf]] is to [[annTopKIvf]] what [[searchCodes]] is
    * to [[annTopK]]). `codes` must carry its IVF list id in `__list`
    * (what [[encode]]'s `keep` preserved at build time); `cent` is the
    * coarse-quantizer centroid frame shipped with the artifact. The
    * 100 TB point: persist the codes HIVE-PARTITIONED BY the list id
    * (`emb_index_ivf_roundtrip` does exactly that) and the routing
    * equi-join touches only the selected lists — with a literal list
    * filter, partition pruning does the routing's I/O (the
    * PartitionFilters pin in PushdownSpec). */
  def searchCodesIvf(codes: DataFrame, cent: DataFrame, probes: DataFrame,
                     idCol: String, vecCol: String, topK: Int,
                     nprobe: Int, numSub: Int = 16, k: Int = 16,
                     subDim: Int = 4,
                     codebook: Codebook = null): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cb = Option(codebook).getOrElse(formulaCodebook(numSub, subDim))
    val tables = (0 until numSub).map { s =>
      array(subScores(col(vecCol), numSub, k, subDim, s, cb)
        .map(sc => (sc * 1e9).cast("decimal(38,0)").cast("long")): _*)
        .as(s"t$s")
    }
    val p = probes.select(col(idCol).as("probe_id") +:
      Vectors.toDouble(col(vecCol)).as("__vp") +: tables: _*)
    // route: nprobe nearest centroids per probe (AnnIvf's exact tiebreak)
    val wSel = Window.partitionBy(col("probe_id"))
      .orderBy(round(col("__ccos"), 9).desc, col("label"))
    val selected = p.crossJoin(broadcast(cent))
      .withColumn("__ccos", Vectors.cosine(col("__vp"), col("centroid")))
      .withColumn("__crn", row_number().over(wSel))
      .where(col("__crn") <= nprobe)
      .select(col("probe_id") +: col("label").as("__list") +:
        (0 until numSub).map(s => col(s"t$s")): _*)
    val adc = (0 until numSub)
      .map(s => element_at(col(s"t$s"), (col(s"code$s") + 1).cast("int")))
      .reduce(_ + _)
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(desc("adc_e9"), col(idCol))
    selected.join(codes, "__list")
      .withColumn("adc_e9", adc)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col(idCol).as("neighbor_id"),
        col("adc_e9"))
  }

  /** Two-stage search: PQ-ADC shortlists `shortlist` candidates per
    * probe (codes only), then ONLY those rows re-join their full-width
    * vectors for an exact-L2 rerank to `topK` — the standard
    * retrieve-then-refine pipeline. At scale the fat-vector read drops
    * from |corpus| to |probes|·shortlist rows, and the shortlist join
    * is an equi-join on the corpus id (broadcast from the probe side),
    * so the refine stage never shuffles the corpus. `l2_e9` is the
    * exact squared L2 distance, round(9)·1e9 as BIGINT (ascending =
    * nearest; the ADC surrogate never surfaces in the output). */
  def annTopKRefined(corpus: DataFrame, probes: DataFrame, idCol: String,
                     vecCol: String, topK: Int, shortlist: Int,
                     numSub: Int = 16, k: Int = 16, subDim: Int = 4,
                     codebook: Codebook = null): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shortlist >= topK, "shortlist must be >= topK")
    val cand = annTopK(corpus, probes, idCol, vecCol, shortlist,
        numSub, k, subDim, codebook)
      .select(col("probe_id"), col("neighbor_id"))
    val pv = probes.select(col(idCol).as("probe_id"),
      Vectors.toDouble(col(vecCol)).as("__pv"))
    val cv = corpus.select(col(idCol).as("neighbor_id"),
      Vectors.toDouble(col(vecCol)).as("__cv"))
    val l2 = (Vectors.dot(col("__pv"), col("__pv"))
      - lit(2.0) * Vectors.dot(col("__pv"), col("__cv"))) +
      Vectors.dot(col("__cv"), col("__cv"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("l2_e9"), col("neighbor_id"))
    cv.join(broadcast(cand.join(pv, "probe_id")), "neighbor_id")
      .withColumn("l2_e9",
        (round(l2, 9) * 1e9).cast("decimal(38,0)").cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("neighbor_id"),
        col("l2_e9"))
  }

  /** DuckDB mirror of [[annTopKRefined]] — [[annTopKSql]] as the
    * shortlist CTE, then the identical exact-L2 rerank. */
  def annTopKRefinedSql(table: String, id: String, vec: String,
                        corpusPred: String, probePred: String, topK: Int,
                        shortlist: Int, numSub: Int = 16, k: Int = 16,
                        subDim: Int = 4): String = {
    val dvec = s"list_transform($vec, x -> CAST(x AS DOUBLE))"
    s"""WITH cand AS (
       |  SELECT probe_id, neighbor_id FROM (
       |    ${annTopKSql(table, id, vec, corpusPred, probePred, shortlist,
      numSub, k, subDim).replace("\n", "\n|    ")}) sl),
       |pv AS (SELECT $id AS probe_id, $dvec AS pv
       |       FROM $table WHERE $probePred),
       |cv AS (SELECT $id AS neighbor_id, $dvec AS cv
       |       FROM $table WHERE $corpusPred),
       |d AS (
       |  SELECT cand.probe_id, cand.neighbor_id,
       |    CAST(CAST(round(list_dot_product(pv, pv)
       |        - 2.0 * list_dot_product(pv, cv)
       |        + list_dot_product(cv, cv), 9) * 1e9
       |      AS DECIMAL(38,0)) AS BIGINT) AS l2_e9
       |  FROM cand JOIN pv USING (probe_id) JOIN cv USING (neighbor_id)),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |      ORDER BY l2_e9, neighbor_id) AS rank
       |  FROM d)
       |SELECT probe_id, rank, neighbor_id, l2_e9
       |FROM r WHERE rank <= $topK""".stripMargin
  }

  private def centSql(cent: Seq[Double]): String =
    cent.mkString("[", ", ", "]")

  /** DuckDB CTE chain that REPLAYS [[learnCodebook]] relationally —
    * the C83/C91 unrolled-iteration discipline applied to Lloyd: the
    * same md5('pq:'+id)-ranked bounded sample, the same first-k seeds,
    * `iters` unrolled (assign, re-center) rounds, and the same
    * end-of-loop seed fallback for emptied clusters. Every float step
    * is order-pinned: distances are explicit left-assoc component sums
    * (bit-equal to the Scala while-loop dots), means are exact
    * floor(x·1e6) BIGINT sums divided by the same n·1e6 double, so the
    * learned codebook is bit-identical across engines and the one
    * data-dependent query gains a true cross-engine oracle.
    * Produces `__cb(s, l, c0..c{subDim-1})`. */
  private def learnedCbCtes(table: String, id: String, vec: String,
                            corpusPred: String, numSub: Int, k: Int,
                            subDim: Int, iters: Int,
                            sampleN: Int): String = {
    val dims = 0 until subDim
    def sum(term: Int => String) = dims.map(term).mkString(" + ")
    val iterCtes = (1 to iters).map { i =>
      s"""__asg$i AS (
         |  SELECT rid, s, l FROM (
         |    SELECT p.rid, p.s, c.l,
         |      row_number() OVER (PARTITION BY p.rid, p.s ORDER BY
         |        (${sum(j => s"p.x$j*p.x$j")})
         |        - 2.0 * (${sum(j => s"p.x$j*c.c$j")})
         |        + (${sum(j => s"c.c$j*c.c$j")}), c.l) AS rk
         |    FROM __pts p JOIN __cents${i - 1} c ON p.s = c.s) WHERE rk = 1),
         |__cents$i AS (
         |  SELECT a.s, a.l,
         |    ${dims.map(j => s"CAST(SUM(CAST(floor(p.x$j * 1e6) AS BIGINT)) " +
          s"AS DOUBLE) / (COUNT(*) * 1e6) AS c$j").mkString(",\n|    ")}
         |  FROM __asg$i a JOIN __pts p ON a.rid = p.rid AND a.s = p.s
         |  GROUP BY a.s, a.l)""".stripMargin
    }.mkString(",\n")
    s"""__corpus AS (
       |  SELECT $id AS id, list_transform($vec, x -> CAST(x AS DOUBLE)) AS v
       |  FROM $table WHERE $corpusPred),
       |__samp AS (
       |  SELECT v, row_number() OVER (
       |    ORDER BY md5('pq:' || CAST(id AS VARCHAR))) AS rid
       |  FROM __corpus),
       |__pts AS (
       |  SELECT rid, t.s,
       |    ${dims.map(j => s"v[t.s*$subDim+${j + 1}] AS x$j").mkString(", ")}
       |  FROM __samp CROSS JOIN
       |    (SELECT CAST(range AS INTEGER) AS s FROM range($numSub)) t
       |  WHERE rid <= $sampleN),
       |__cents0 AS (
       |  SELECT s, CAST(rid - 1 AS INTEGER) AS l,
       |    ${dims.map(j => s"x$j AS c$j").mkString(", ")}
       |  FROM __pts WHERE rid <= $k),
       |$iterCtes,
       |__cb AS (
       |  SELECT s0.s, s0.l,
       |    ${dims.map(j => s"coalesce(g.c$j, s0.c$j) AS c$j").mkString(", ")}
       |  FROM __cents0 s0
       |  LEFT JOIN __cents$iters g ON s0.s = g.s AND s0.l = g.l)""".stripMargin
  }

  /** DuckDB oracle for the learned codebook itself: one row per
    * (subspace, centroid, dim) with the raw double component — a
    * bit-exact weights pin, the PQ analogue of C83's trained-weight
    * hash pin. */
  def learnedCodebookSql(table: String, id: String, vec: String,
                         corpusPred: String, numSub: Int = 16,
                         k: Int = 16, subDim: Int = 4, iters: Int = 3,
                         sampleN: Int = 256): String = {
    val comp = (0 until subDim - 1)
      .map(j => s"WHEN $j THEN c$j").mkString(" ")
    s"""WITH ${learnedCbCtes(table, id, vec, corpusPred, numSub, k,
        subDim, iters, sampleN)}
       |SELECT s AS subspace, l AS centroid, d.j AS dim,
       |  CASE d.j $comp ELSE c${subDim - 1} END AS comp
       |FROM __cb CROSS JOIN
       |  (SELECT CAST(range AS INTEGER) AS j FROM range($subDim)) d
       |ORDER BY subspace, centroid, dim""".stripMargin
  }

  /** DuckDB mirror of [[annTopK]] under the LEARNED codebook: the
    * [[learnedCbCtes]] replay feeds the same score ladder relationally
    * (scores/codes/e9 tables join the `__cb` relation instead of
    * inlining formula literals; the integer ADC sum is order-free). */
  def learnedAnnSql(table: String, id: String, vec: String,
                    corpusPred: String, probePred: String, topK: Int,
                    numSub: Int = 16, k: Int = 16, subDim: Int = 4,
                    iters: Int = 3, sampleN: Int = 256): String = {
    val dims = 0 until subDim
    def score(v: String) =
      s"round(2.0 * (${dims.map(j => s"$v[b.s*$subDim+${j + 1}]*b.c$j")
        .mkString(" + ")}) - (${dims.map(j => s"b.c$j*b.c$j")
        .mkString(" + ")}), 9)"
    s"""WITH ${learnedCbCtes(table, id, vec, corpusPred, numSub, k,
        subDim, iters, sampleN)},
       |__probes AS (
       |  SELECT $id AS id, list_transform($vec, x -> CAST(x AS DOUBLE)) AS v
       |  FROM $table WHERE $probePred),
       |__csc AS (
       |  SELECT c.id, b.s, b.l, ${score("c.v")} AS sc
       |  FROM __corpus c CROSS JOIN __cb b),
       |__codes AS (
       |  SELECT id, s, l AS code FROM (
       |    SELECT id, s, l,
       |      row_number() OVER (PARTITION BY id, s ORDER BY sc DESC, l) AS rk
       |    FROM __csc) WHERE rk = 1),
       |__pt AS (
       |  SELECT p.id AS probe_id, b.s, b.l,
       |    CAST(CAST(${score("p.v")} * 1e9 AS DECIMAL(38,0)) AS BIGINT) AS t
       |  FROM __probes p CROSS JOIN __cb b),
       |__adc AS (
       |  SELECT pt.probe_id, cd.id AS neighbor_id,
       |    CAST(SUM(pt.t) AS BIGINT) AS adc_e9
       |  FROM __codes cd JOIN __pt pt ON cd.s = pt.s AND cd.code = pt.l
       |  GROUP BY pt.probe_id, cd.id),
       |__r AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |      ORDER BY adc_e9 DESC, neighbor_id) AS rank
       |  FROM __adc)
       |SELECT probe_id, rank, neighbor_id, adc_e9
       |FROM __r WHERE rank <= $topK""".stripMargin
  }

  /** DuckDB fragment: the subspace-s score of centroid c for `vec`. */
  private def subScoreSql(vec: String, numSub: Int, subDim: Int,
                          s: Int, c: Int): String = {
    val cent = centroid(numSub, subDim, s, c)
    val sub = s"list_transform($vec[${s * subDim + 1}:${(s + 1) * subDim}]," +
      " x -> CAST(x AS DOUBLE))"
    s"round(2.0 * list_dot_product($sub, ${centSql(cent)}) - ${normSq(cent)}, 9)"
  }

  /** DuckDB mirror of [[annTopK]] — same centroids, ladder, argmax
    * chains, e9 tables, and integer ADC sums. */
  def annTopKSql(table: String, id: String, vec: String,
                 corpusPred: String, probePred: String, topK: Int,
                 numSub: Int = 16, k: Int = 16, subDim: Int = 4): String = {
    def scoreCols(alias: String) = (0 until numSub).flatMap(s =>
      (0 until k).map(c =>
        s"${subScoreSql(vec, numSub, subDim, s, c)} AS ${alias}_${s}_$c"))
      .mkString(",\n|    ")
    def codeChain(s: Int) = {
      val whens = (0 until k - 1).map { c =>
        val conds = (c + 1 until k).map(j => s"s_${s}_$c >= s_${s}_$j")
          .mkString(" AND ")
        s"WHEN $conds THEN $c"
      }.mkString(" ")
      s"CASE $whens ELSE ${k - 1} END AS code$s"
    }
    def tableCols = (0 until numSub).flatMap(s =>
      (0 until k).map(c =>
        s"CAST(CAST(p_${s}_$c * 1e9 AS DECIMAL(38,0)) AS BIGINT)" +
          s" AS t_${s}_$c")).mkString(",\n|    ")
    def lookup(s: Int) =
      s"(CASE code$s ${(0 until k).map(c => s"WHEN $c THEN t_${s}_$c")
        .mkString(" ")} END)"
    val adc = (0 until numSub).map(lookup).mkString(" + ")
    s"""WITH cs AS (
       |  SELECT $id,
       |    ${scoreCols("s")}
       |  FROM $table WHERE $corpusPred),
       |codes AS (
       |  SELECT $id, ${(0 until numSub).map(codeChain).mkString(",\n|    ")}
       |  FROM cs),
       |ps AS (
       |  SELECT $id AS probe_id,
       |    ${scoreCols("p")}
       |  FROM $table WHERE $probePred),
       |pt AS (
       |  SELECT probe_id,
       |    $tableCols
       |  FROM ps),
       |j AS (
       |  SELECT pt.probe_id, codes.$id AS neighbor_id, $adc AS adc_e9
       |  FROM codes CROSS JOIN pt),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |      ORDER BY adc_e9 DESC, neighbor_id) AS rank
       |  FROM j)
       |SELECT probe_id, rank, neighbor_id, adc_e9
       |FROM r WHERE rank <= $topK""".stripMargin
  }

  /** DuckDB mirror of [[annTopKIvf]] — the [[annTopKSql]] ladder with
    * the codes CTE carrying the list id and the cross join replaced by
    * IVF routing (AnnIvf's exact-fixed-point centroids, round(9)
    * cosine, label tiebreak) plus an equi-join on the selected lists. */
  def annTopKIvfSql(table: String, id: String, vec: String,
                    corpusPred: String, probePred: String, topK: Int,
                    nprobe: Int, numSub: Int = 16, k: Int = 16,
                    subDim: Int = 4): String = {
    def scoreCols(alias: String) = (0 until numSub).flatMap(s =>
      (0 until k).map(c =>
        s"${subScoreSql(vec, numSub, subDim, s, c)} AS ${alias}_${s}_$c"))
      .mkString(",\n|    ")
    def codeChain(s: Int) = {
      val whens = (0 until k - 1).map { c =>
        val conds = (c + 1 until k).map(j => s"s_${s}_$c >= s_${s}_$j")
          .mkString(" AND ")
        s"WHEN $conds THEN $c"
      }.mkString(" ")
      s"CASE $whens ELSE ${k - 1} END AS code$s"
    }
    def tableCols = (0 until numSub).flatMap(s =>
      (0 until k).map(c =>
        s"CAST(CAST(p_${s}_$c * 1e9 AS DECIMAL(38,0)) AS BIGINT)" +
          s" AS t_${s}_$c")).mkString(",\n|    ")
    def lookup(s: Int) =
      s"(CASE code$s ${(0 until k).map(c => s"WHEN $c THEN t_${s}_$c")
        .mkString(" ")} END)"
    val adc = (0 until numSub).map(lookup).mkString(" + ")
    val cos = "list_dot_product(pt.v, cent.c)" +
      " / (sqrt(list_dot_product(pt.v, pt.v))" +
      " * sqrt(list_dot_product(cent.c, cent.c)))"
    s"""WITH cs AS (
       |  SELECT $id, label::BIGINT AS list,
       |    ${scoreCols("s")}
       |  FROM $table WHERE $corpusPred),
       |codes AS (
       |  SELECT $id, list, ${(0 until numSub).map(codeChain).mkString(",\n|    ")}
       |  FROM cs),
       |comp AS (
       |  SELECT label::BIGINT AS list, (ord-1)::BIGINT AS dim,
       |         sum(CAST(floor(x*1000000) AS BIGINT)) AS csum, count(*) AS n
       |  FROM (SELECT label, unnest($vec::DOUBLE[]) AS x,
       |               generate_subscripts($vec, 1) AS ord
       |        FROM $table WHERE $corpusPred) t
       |  GROUP BY 1, 2),
       |cent AS (
       |  SELECT list, list(csum / (n * 1000000.0) ORDER BY dim) AS c
       |  FROM comp GROUP BY list),
       |ps AS (
       |  SELECT $id AS probe_id, $vec::DOUBLE[] AS v,
       |    ${scoreCols("p")}
       |  FROM $table WHERE $probePred),
       |pt AS (
       |  SELECT probe_id, v,
       |    $tableCols
       |  FROM ps),
       |sel AS (
       |  SELECT probe_id, list FROM (
       |    SELECT pt.probe_id, cent.list,
       |           row_number() OVER (PARTITION BY pt.probe_id
       |             ORDER BY round($cos, 9) DESC, cent.list) AS crn
       |    FROM pt CROSS JOIN cent) x
       |  WHERE crn <= $nprobe),
       |j AS (
       |  SELECT pt.probe_id, codes.$id AS neighbor_id, $adc AS adc_e9
       |  FROM sel
       |  JOIN codes ON codes.list = sel.list
       |  JOIN pt ON pt.probe_id = sel.probe_id),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY probe_id
       |      ORDER BY adc_e9 DESC, neighbor_id) AS rank
       |  FROM j)
       |SELECT probe_id, rank, neighbor_id, adc_e9
       |FROM r WHERE rank <= $topK""".stripMargin
  }
}
