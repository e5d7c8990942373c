package graft

import org.apache.spark.sql.functions._

import graft.operators.Percentile

/** Bounded-state histogram percentile (B45): the 100 TB quantile path.
  * Contract tested: (a) the estimate lands within one bucket width of
  * the exact percentile; (b) the histogram shuffle is capped at
  * |groups| x |buckets| rows regardless of input size; (c) the column
  * naming rule used by the oracle generator. */
class PercentileSpec extends SparkSpec {

  test("histogram estimate within one bucket width of the straddling " +
    "order statistic") {
    // The provable contract: the estimate and the order statistic at
    // rank ceil(p*n) share a bucket, so they differ by < widthE. (The
    // INTERPOLATED percentile can sit arbitrarily far away when data is
    // sparse — adjacent order statistics may span many empty buckets —
    // so that is deliberately NOT the contract.)
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), cents.as("cents"))
    val ps = Seq(0.5, 0.9, 0.99)
    val widthE = 1000L
    val got = Percentile
      .histogramPercentiles(base, "o_orderpriority", "cents", widthE, ps)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(got.nonEmpty)
    val rows = base.collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
      .map { case (g, rs) => g -> rs.map(_.getAs[Long]("cents")).sorted }
    rows.foreach { case (grp, sorted) =>
      val est = got(grp)
      val n = sorted.length
      ps.foreach { p =>
        val orderStat = sorted(math.ceil(p * n).toInt - 1).toDouble
        val hv = est.getAs[Double](Percentile.pColName(p))
        assert(math.abs(hv - orderStat) < widthE.toDouble,
          s"$grp p=$p: est=$hv orderStat=$orderStat not within $widthE")
      }
    }
  }

  test("histogram state is |groups| x |buckets|, not |rows|") {
    // 10k rows over 3 groups with values in [0, 10000) and width 100
    // must histogram down to at most 3 x 100 rows before any window.
    val df = spark.range(10000).select(
      (col("id") % 3).cast("string").as("g"),
      (col("id") * 37 % 10000).as("v"))
    val hist = df.select(col("g"), expr("v div 100").as("b"))
      .groupBy("g", "b").count()
    assert(hist.count() <= 300)
    val out = Percentile.histogramPercentiles(df, "g", "v", 100L, Seq(0.5))
    assert(out.count() === 3)
  }

  test("histogram MAD within one bucket of its deviation-distribution " +
    "order statistic") {
    // The operator contract, stage by stage: given ITS median estimate
    // (med_hist), the second histogram's answer shares a bucket with
    // the rank-ceil(n/2) order statistic of abs(v - med_hist) — same
    // bound as histogramPercentiles, applied to the deviation pass.
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("g"), cents.as("cents"))
    val widthE = 1000L
    val got = Percentile.histogramMad(base, "g", "cents", widthE)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    val rows = base.collect()
      .groupBy(_.getAs[String]("g"))
      .map { case (g, rs) => g -> rs.map(_.getAs[Long]("cents")) }
    rows.foreach { case (g, vals) =>
      val med = got(g).getAs[Double]("med_hist")
      val hv = got(g).getAs[Double]("mad_hist")
      val devs = vals.map(v => math.abs(v.toDouble - med)).sorted
      val orderStat = devs(math.ceil(0.5 * devs.length).toInt - 1)
      assert(math.abs(hv - orderStat) < widthE.toDouble,
        s"$g: mad_hist=$hv orderStat=$orderStat not within $widthE")
    }
  }

  test("digest merge is an exact identity: digest(a u b) == " +
    "merge(digest(a), digest(b))") {
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val base = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_orderkey"), cents.as("cents"))
    def half(r: Int) = base.where(pmod(col("o_orderkey"), lit(2L)) === r)
    val merged = Percentile.percentilesFromDigest(
      Percentile.mergeDigests(
        Percentile.histogramDigest(half(0), "o_orderpriority", "cents", 1000L),
        Percentile.histogramDigest(half(1), "o_orderpriority", "cents", 1000L)),
      1000L, Seq(0.5, 0.9, 0.99)).collect().map(_.toSeq).toSet
    val full = Percentile.histogramPercentiles(base, "o_orderpriority",
      "cents", 1000L, Seq(0.5, 0.9, 0.99)).collect().map(_.toSeq).toSet
    assert(merged === full)
  }

  test("histogram trimmed mean is BIT-IDENTICAL to the windowed form") {
    import org.apache.spark.sql.expressions.Window
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val base = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderkey"),
        cents.as("cents"))
    val got = Percentile.histogramTrimmedMean(base, "segment", "cents",
        "o_orderkey", widthE = 1000L)
      .collect().map(r => (r.getAs[String]("grp"),
        r.getAs[Long]("n_kept"), r.getAs[Double]("trimmed_mean"))).sorted
    val bySeg = Window.partitionBy(col("segment"))
    val w = bySeg.orderBy(col("cents"), col("o_orderkey"))
    val exact = base
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(bySeg))
      .where(col("rn") > floor(col("cnt") / 10) &&
        col("rn") <= col("cnt") - floor(col("cnt") / 10))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_kept"),
        round(sum(col("cents")).cast("double")
          / count(lit(1)) / 100.0, 4).as("trimmed_mean"))
      .collect().map(r => (r.getAs[String]("segment"),
        r.getAs[Long]("n_kept"), r.getAs[Double]("trimmed_mean"))).sorted
    assert(got.toSeq === exact.toSeq)
  }

  test("histogram trimmed mean: n < 10 groups keep everything") {
    import spark.implicits._
    val tiny = Seq(("a", 1L, 100L), ("a", 2L, 200L), ("a", 3L, 900L))
      .toDF("g", "id", "v")
    val r = Percentile.histogramTrimmedMean(tiny, "g", "v", "id", 50L)
      .first()
    assert(r.getAs[Long]("n_kept") === 3L)
    assert(r.getAs[Double]("trimmed_mean") === 4.0) // 1200/3/100
  }

  test("pColName matches the oracle generator's naming") {
    assert(Percentile.pColName(0.5) === "p50_hist")
    assert(Percentile.pColName(0.9) === "p90_hist")
    assert(Percentile.pColName(0.99) === "p99_hist")
    assert(Percentile.pColName(0.999) === "p999_hist")
  }

  test("colliding percentile column names are rejected, not silently " +
    "duplicated") {
    // 0.25 and 0.025 both map to p25_hist under the single-zero trim;
    // both the Spark plan and the SQL generator must refuse the list.
    val dummy = spark.range(1).selectExpr("'g' AS grp", "id AS b",
      "1L AS cnt")
    intercept[IllegalArgumentException] {
      Percentile.percentilesFromDigest(dummy, 10L, Seq(0.25, 0.025))
    }
    intercept[IllegalArgumentException] {
      Percentile.histogramPercentileSql("t", "g", "v", 10L, Seq(0.25, 0.025))
    }
  }
}
