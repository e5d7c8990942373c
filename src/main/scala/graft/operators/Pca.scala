package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA / whitening over an embedding column — the standard
  * corpus-conditioning step before ANN, SemDeDup, or quantization
  * (decorrelate + equalize variance so cosine/L2 distances mean the
  * same thing in every direction).
  *
  * Scale shape: the ONLY corpus-sized work is [[gramMoments]] — a
  * single pass that accumulates per-partition first/second moment
  * partials in an O(d²) array (the MLlib Gramian / treeAggregate
  * pattern, via mapPartitions because a per-row explode to (i, j)
  * pairs would be N·d²/2 shuffle rows — 2080× the input at d=64),
  * then reduces ~2k-row partials with one exact decimal groupBy. The
  * d×d result is driver-side tiny: eigensolve and whitener
  * construction ([[jacobiEigen]], [[whitener]]) never see corpus data,
  * and [[project]] is a broadcast-literal zip_with/aggregate — pure
  * codegen, no shuffle, no UDF.
  *
  * Cross-engine determinism: components quantize to scale-`1e6` longs
  * at the scan (`floor(x·1e6)`), so every moment is an exact integer
  * sum — order-independent, hash-stable (float accumulation is
  * neither). Per-chunk partials bound int64: a chunk of `chunkRows`
  * rows adds ≤ chunkRows·(maxAbs·scale)² per cell, and the global
  * reduce sums DECIMAL(38,0); only the final per-cell value must fit
  * BIGINT — pick `scale` so n·(maxAbs·scale)² < 2⁶³ at your corpus
  * size (e6 is right for harness SFs; 1e9 vectors wants e3). */
object Pca {

  val Scale = 1000000L

  /** Exact fixed-point moment table: rows `(i, j, s, n)` where
    * `j == -1` carries the first moment Σ xᵢ (scale e6) and `j ≥ i`
    * the second moment Σ xᵢ·xⱼ (scale e12); `n` = corpus row count on
    * every row. Output is d + d(d+1)/2 rows regardless of corpus
    * size. */
  def gramMoments(embs: DataFrame, vecCol: String, d: Int,
                  scale: Long = Scale,
                  chunkRows: Int = 100000): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val quant = embs.select(
      transform(col(vecCol),
        x => floor(x.cast("double") * scale).cast("long")).as("q"))
    val partials = quant.as[Array[Long]].mapPartitions { it =>
      it.grouped(chunkRows).flatMap { chunk =>
        val sxy = new Array[Long](d * (d + 1) / 2)
        val sx = new Array[Long](d)
        var n = 0L
        chunk.foreach { q =>
          require(q != null, "null embedding row in gramMoments input")
          require(q.length == d,
            s"embedding dim ${q.length} != expected $d")
          n += 1
          var i = 0
          var k = 0
          while (i < d) {
            val qi = q(i)
            sx(i) += qi
            var j = i
            while (j < d) { sxy(k) += qi * q(j); k += 1; j += 1 }
            i += 1
          }
        }
        val firsts = Iterator.tabulate(d)(i => (i.toLong, -1L, sx(i), n))
        val seconds = new Iterator[(Long, Long, Long, Long)] {
          private var i = 0; private var j = 0; private var k = 0
          def hasNext: Boolean = k < sxy.length
          def next(): (Long, Long, Long, Long) = {
            val r = (i.toLong, j.toLong, sxy(k), n)
            k += 1; j += 1
            if (j == d) { i += 1; j = i }
            r
          }
        }
        firsts ++ seconds
      }
    }.toDF("i", "j", "s", "n")
    partials.groupBy(col("i"), col("j"))
      .agg(sum(col("s").cast("decimal(38,0)")).cast("long").as("s"),
        sum(col("n")).as("n"))
  }

  /** DuckDB mirror of [[gramMoments]] — same scan-time quantization,
    * exact HUGEINT sums collapsed to BIGINT. */
  def gramMomentsSql(table: String, vecCol: String,
                     scale: Long = Scale): String =
    s"""WITH q AS (
       |  SELECT vec_id, (ord - 1)::BIGINT AS dim,
       |         CAST(floor(x * $scale) AS BIGINT) AS xs
       |  FROM (SELECT vec_id, unnest($vecCol::DOUBLE[]) AS x,
       |               generate_subscripts($vecCol, 1) AS ord
       |        FROM $table) t),
       |n AS (SELECT count(DISTINCT vec_id) AS n FROM q),
       |firsts AS (
       |  SELECT dim AS i, CAST(-1 AS BIGINT) AS j,
       |         CAST(sum(xs) AS BIGINT) AS s
       |  FROM q GROUP BY 1),
       |seconds AS (
       |  SELECT a.dim AS i, b.dim AS j, CAST(sum(a.xs * b.xs) AS BIGINT) AS s
       |  FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
       |  GROUP BY 1, 2)
       |SELECT i, j, s, n FROM firsts, n
       |UNION ALL
       |SELECT i, j, s, n FROM seconds, n""".stripMargin

  /** Driver-side: (mean, covariance, n) from a collected
    * [[gramMoments]] result. Unbiased (n−1) covariance. */
  def covarianceFromMoments(rows: Seq[(Long, Long, Long, Long)], d: Int,
                            scale: Long = Scale)
      : (Array[Double], Array[Array[Double]], Long) = {
    require(rows.nonEmpty && rows.head._4 >= 2,
      "covariance needs n >= 2 rows of moments")
    val n = rows.head._4
    val mean = new Array[Double](d)
    val cov = Array.ofDim[Double](d, d)
    rows.foreach { case (i, j, s, _) =>
      if (j == -1L) mean(i.toInt) = s.toDouble / scale / n
    }
    rows.foreach { case (bi, bj, s, _) =>
      if (bj >= 0L) {
        val (i, j) = (bi.toInt, bj.toInt)
        val exy = s.toDouble / scale / scale / n
        val c = (exy - mean(i) * mean(j)) * n / (n - 1.0)
        cov(i)(j) = c
        cov(j)(i) = c
      }
    }
    (mean, cov, n)
  }

  /** Cyclic Jacobi eigensolve for a small symmetric matrix (driver
    * side; d ≤ a few hundred). Returns (eigenvalues, eigenvectors as
    * ROWS), sorted by eigenvalue descending, each vector's first
    * nonzero component made positive so the sign is deterministic. */
  def jacobiEigen(m: Array[Array[Double]], sweeps: Int = 50)
      : (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < sweeps && off > 1e-12) {
      off = 0.0
      for (p <- 0 until d; q <- (p + 1) until d) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > 1e-14) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(d)(k => v(k)(i))
      val lead = col.find(math.abs(_) > 1e-12).getOrElse(1.0)
      if (lead < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }

  /** Top-`k` whitening rows: eigenvector ÷ √eigenvalue — projecting
    * with these yields unit variance per retained component. */
  def whitener(eigVals: Array[Double], eigVecs: Array[Array[Double]],
               k: Int, eps: Double = 1e-9): Array[Array[Double]] =
    (0 until k).map { i =>
      val inv = 1.0 / math.sqrt(eigVals(i) max eps)
      eigVecs(i).map(_ * inv)
    }.toArray

  /** Project (optionally mean-centered) embeddings onto `comps` rows:
    * output (idCol, p0..p{k-1}) doubles. Broadcast-literal zip_with +
    * aggregate — scan-local, codegen'd, no shuffle. */
  def project(embs: DataFrame, idCol: String, vecCol: String,
              mean: Array[Double], comps: Array[Array[Double]]): DataFrame = {
    val centered = zip_with(col(vecCol).cast("array<double>"),
      array(mean.map(lit): _*), (x, m) => x - m)
    val projCols = comps.zipWithIndex.map { case (c, k) =>
      aggregate(
        zip_with(centered, array(c.map(lit): _*), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x).as(s"p$k")
    }
    embs.select(col(idCol) +: projCols.toSeq: _*)
  }

  /** Fixed-direction integer projection (dimensionality reduction with
    * KNOWN directions — e.g. a frozen random-projection matrix):
    * scale-e6 quantized input × scale-e6 integer directions, summed in
    * int64 — exact, oracle-able. Output (idCol, k, proj_e12). */
  def projectFixed(embs: DataFrame, idCol: String, vecCol: String,
                   dirs: Seq[Seq[Double]],
                   scale: Long = Scale): DataFrame = {
    require(dirs.nonEmpty && dirs.forall(_.nonEmpty),
      "projectFixed needs at least one non-empty direction")
    val quant = transform(col(vecCol),
      x => floor(x.cast("double") * scale).cast("long"))
    val rows = dirs.zipWithIndex.map { case (dir, k) =>
      val d6 = dir.map(c => math.floor(c * scale).toLong)
      struct(lit(k.toLong).as("k"),
        aggregate(
          zip_with(quant, array(d6.map(lit): _*), (x, w) => x * w),
          lit(0L), (acc, x) => acc + x).as("proj_e12"))
    }
    embs.select(col(idCol), explode(array(rows: _*)).as("pr"))
      .select(col(idCol), col("pr.k").as("k"), col("pr.proj_e12"))
  }

  /** DuckDB mirror of [[projectFixed]] — directions inlined as VALUES
    * with the same e6 quantization. */
  def projectFixedSql(table: String, id: String, vecCol: String,
                      dirs: Seq[Seq[Double]],
                      scale: Long = Scale): String = {
    val vals = dirs.zipWithIndex.flatMap { case (dir, k) =>
      dir.zipWithIndex.map { case (c, dim) =>
        s"($k, $dim, ${math.floor(c * scale).toLong})"
      }
    }.mkString(", ")
    require(vals.nonEmpty,
      "projectFixed oracle needs at least one non-empty direction" +
        " (an empty VALUES list is a SQL syntax error, not an empty result)")
    s"""WITH dirs(k, dim, w) AS (VALUES $vals),
       |q AS (
       |  SELECT $id, (ord - 1)::BIGINT AS dim,
       |         CAST(floor(x * $scale) AS BIGINT) AS xs
       |  FROM (SELECT $id, unnest($vecCol::DOUBLE[]) AS x,
       |               generate_subscripts($vecCol, 1) AS ord
       |        FROM $table) t)
       |SELECT $id, CAST(k AS BIGINT) AS k,
       |       CAST(sum(xs * w) AS BIGINT) AS proj_e12
       |FROM q JOIN dirs USING (dim)
       |GROUP BY 1, 2""".stripMargin
  }

  /** Diagonal-Mahalanobis OOD score per vector — the embedding-health
    * outlier screen ([[graft.queries.Docs]] C85): corrupt rows, wrong
    * models, and distribution shift all land in the z²-sum tail that
    * the norm-only health report (C28) can't see.
    *
    * score = Σ_i (x_i − μ_i)²/σ²_i over the per-dimension corpus
    * moments (diagonal covariance — the full-Σ Mahalanobis needs the
    * driver eigensolve and is NOT engine-deterministic; the diagonal
    * is, and is the standard cheap screen).
    *
    * Determinism ladder: components quantize to scale-e6 longs at the
    * scan; per-dim moments are exact integer sums (s², 128-bit); μ/σ²
    * derive from them with identical IEEE double expressions in both
    * engines; each per-dim term rounds to an e9 BIGINT BEFORE the
    * per-vector sum, so the reduction is exact-integer and
    * order-independent.
    *
    * Scale shape: one |corpus|×d explode → d-row moment aggregate
    * (map-side combined, d rows reach the reduce); the d-row stats
    * frame broadcasts back, scoring is a scan-local zip_with/aggregate
    * fold (no second shuffle). Top-N consumers TakeOrdered — no global
    * sort. */
  def diagOod(emb: DataFrame, idCol: String, vecCol: String,
              payload: Seq[String] = Nil,
              scale: Long = Scale): DataFrame = {
    val q = transform(col(vecCol), x =>
      floor(x.cast("double") * scale).cast("long"))
    val base = emb.select(
      Seq(col(idCol)) ++ payload.map(col) :+ q.as("__q"): _*)
    val dims = base
      .select(posexplode(col("__q")).as(Seq("dim", "qx")))
      .groupBy(col("dim"))
      .agg(sum(col("qx")).as("s1"),
        sum((col("qx") * col("qx")).cast("decimal(38,0)")).as("s2"),
        count(lit(1)).as("n"))
    def muOf(c: Column): Column =
      c.getField("s1").cast("double") / c.getField("n").cast("double")
    val stats = dims.groupBy()
      .agg(array_sort(collect_list(
        struct(col("dim"), col("s1"), col("s2"), col("n")))).as("cs"))
      .select(
        transform(col("cs"), muOf _).as("__mu"),
        transform(col("cs"), c =>
          c.getField("s2").cast("double") / c.getField("n").cast("double")
            - muOf(c) * muOf(c)).as("__vr"))
    val pair = zip_with(col("__mu"), col("__vr"),
      (m, v) => struct(m.as("m"), v.as("v")))
    base.crossJoin(broadcast(stats))
      .withColumn("__terms", zip_with(col("__q"), pair, (qi, st) =>
        when(st.getField("v") > 0,
          round(((qi.cast("double") - st.getField("m"))
            * (qi.cast("double") - st.getField("m"))
            / st.getField("v")) * lit(1.0e9)).cast("long"))
          .otherwise(lit(0L))))
      .withColumn("ood_e9",
        aggregate(col("__terms"), lit(0L), (a, t) => a + t))
      .drop("__q", "__mu", "__vr", "__terms")
  }

  /** DuckDB mirror of [[diagOod]] — explode form (the per-dim terms
    * are e9 integers before the per-vector sum, so the grouped sum is
    * exact there too). */
  def diagOodSql(table: String, idCol: String, vecCol: String,
                 scale: Long = Scale): String =
    s"""WITH qv AS (
       |  SELECT $idCol, ($vecCol)::DOUBLE[] AS v FROM $table),
       |d AS (
       |  SELECT $idCol, (ord - 1)::BIGINT AS dim,
       |         CAST(floor(x * $scale) AS BIGINT) AS qx
       |  FROM (SELECT $idCol, unnest(v) AS x,
       |               generate_subscripts(v, 1) AS ord
       |        FROM qv) t),
       |st AS (
       |  SELECT dim,
       |    CAST(sum(qx) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m,
       |    CAST(sum(qx * qx) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |      - (CAST(sum(qx) AS DOUBLE) / CAST(count(*) AS DOUBLE))
       |      * (CAST(sum(qx) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS v
       |  FROM d GROUP BY dim),
       |terms AS (
       |  SELECT d.$idCol,
       |    CASE WHEN st.v > 0
       |      THEN CAST(round((((CAST(qx AS DOUBLE) - st.m)
       |           * (CAST(qx AS DOUBLE) - st.m)) / st.v)
       |           * 1000000000.0) AS BIGINT)
       |      ELSE 0 END AS t
       |  FROM d JOIN st USING (dim))
       |SELECT $idCol, CAST(sum(t) AS BIGINT) AS ood_e9
       |FROM terms GROUP BY $idCol""".stripMargin
}
