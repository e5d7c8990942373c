package graft

import org.apache.spark.sql.functions._

import graft.operators.Hll

/** Deterministic HLL (B14 oracle-backed path): bounded relative error
  * vs the exact distinct count, stable across runs, exact integer
  * register digest. Standard error at m=64 is ~13%; assertions allow
  * 2.7 sigma (35%) so they are tight but not flaky across testdata
  * regenerations. */
class HllSpec extends SparkSpec {

  private def relErr(est: Double, exact: Long): Double =
    math.abs(est - exact) / exact

  test("estimate within 35% of exact on orders.o_custkey") {
    val o = Tables.orders(spark, sfDir)
    val exact = o.select(countDistinct(col("o_custkey"))).first().getLong(0)
    val r = Hll.distinctEstimate(o, col("o_custkey")).first()
    assert(relErr(r.getAs[Double]("est_hll"), exact) <= 0.35,
      s"est=${r.getAs[Double]("est_hll")} exact=$exact")
  }

  test("estimate within 35% of exact on lineitem.l_orderkey") {
    val l = Tables.lineitem(spark, sfDir)
    val exact = l.select(countDistinct(col("l_orderkey"))).first().getLong(0)
    val r = Hll.distinctEstimate(l, col("l_orderkey")).first()
    assert(relErr(r.getAs[Double]("est_hll"), exact) <= 0.35,
      s"est=${r.getAs[Double]("est_hll")} exact=$exact")
  }

  test("register merge is an exact identity: sketch(a u b) == " +
    "merge(sketch(a), sketch(b))") {
    val o = Tables.orders(spark, sfDir)
    def half(r: Int) = o.where(pmod(col("o_orderkey"), lit(2L)) === r)
    val merged = Hll.estimateFromRegisters(Hll.mergeRegisters(
      Hll.registers(half(0), col("o_custkey")),
      Hll.registers(half(1), col("o_custkey")))).first()
    val full = Hll.distinctEstimate(o, col("o_custkey")).first()
    assert(merged.getAs[Long]("denom_e27") === full.getAs[Long]("denom_e27"))
    assert(merged.getAs[Double]("est_hll") === full.getAs[Double]("est_hll"))
  }

  test("one-scan grouped-digest merge == per-scope registers merge") {
    val o = Tables.orders(spark, sfDir)
      .withColumn("half", pmod(col("o_orderkey"), lit(2L)))
    def half(r: Int) = o.where(col("half") === r)
    val oneScan = Hll.mergeGroupedRegisters(
      Hll.groupedRegisters(o, "half", col("o_custkey")))
    val perScope = Hll.mergeRegisters(
      Hll.registers(half(0), col("o_custkey")),
      Hll.registers(half(1), col("o_custkey")))
    assert(oneScan.exceptAll(perScope).count() === 0)
    assert(perScope.exceptAll(oneScan).count() === 0)
    assert(oneScan.count() === 64)
  }

  test("grouped estimate within 35% of exact per group") {
    val o = Tables.orders(spark, sfDir)
    val exact = o.groupBy(col("o_orderpriority"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n"))
      .toMap
    val got = Hll.groupedDistinctEstimate(o, "o_orderpriority",
      col("o_custkey")).collect()
    assert(got.length === exact.size)
    got.foreach { r =>
      val g = r.getAs[String]("grp")
      assert(relErr(r.getAs[Double]("est_hll"), exact(g)) <= 0.35,
        s"$g: est=${r.getAs[Double]("est_hll")} exact=${exact(g)}")
    }
  }

  test("streaming register digest equals the batch digest") {
    // The digest aggregation is monotone (max), so the SAME code runs
    // over an unbounded stream in complete mode with m rows of state
    // per group; parity with the batch digest is exact, not
    // approximate.
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("hll-stream").toString
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), col("o_custkey"))
    o.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(o.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = Hll.groupedRegisters(stream, "o_orderpriority",
        col("o_custkey"))
      .writeStream.format("memory").queryName("hll_regs_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("hll_regs_stream")
    val batch = Hll.groupedRegisters(o, "o_orderpriority",
      col("o_custkey"))
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("estimator is unbiased for m != 64: rank ladder depth derives " +
    "from m") {
    // With the ladder depth hard-coded to 26 (the m=64 width), m=16
    // had P(rank=1) = 7/8 instead of 1/2 (estimates ~2x low) and
    // m=256 could never see ranks above 25 (estimates high). SE is
    // 1.04/sqrt(m): allow ~2.7 sigma per m. Cardinality must sit well
    // above the raw estimator's small-range bias zone (~2.5m; the
    // linear-counting correction is deliberately not applied), so use
    // a 20k-key synthetic frame, not sf0.001's 150 custkeys.
    val keys = spark.range(20000).selectExpr("CAST(id AS STRING) AS k")
    val exact = 20000L
    for ((m, tol) <- Seq(16 -> 0.75, 32 -> 0.50, 128 -> 0.25, 256 -> 0.18)) {
      val r = Hll.distinctEstimate(keys, col("k"), m = m).first()
      assert(relErr(r.getAs[Double]("est_hll"), exact) <= tol,
        s"m=$m: est=${r.getAs[Double]("est_hll")} exact=$exact")
    }
  }

  test("overlap: component estimates match single-scope sketches and " +
    "inclusion-exclusion holds on the rounded components") {
    val o = Tables.orders(spark, sfDir)
    val inA = col("o_orderpriority") === "1-URGENT"
    val inB = col("o_orderpriority") === "5-LOW"
    val r = Hll.overlapEstimate(o, inA, inB, col("o_custkey")).first()
    // The three register columns come from one aggregation, but each
    // must equal the estimate a dedicated single-scope sketch produces.
    val estA = Hll.distinctEstimate(o.where(inA), col("o_custkey"))
      .first().getAs[Double]("est_hll")
    val estB = Hll.distinctEstimate(o.where(inB), col("o_custkey"))
      .first().getAs[Double]("est_hll")
    val estU = Hll.distinctEstimate(o.where(inA || inB), col("o_custkey"))
      .first().getAs[Double]("est_hll")
    assert(r.getAs[Double]("est_a") === estA)
    assert(r.getAs[Double]("est_b") === estB)
    assert(r.getAs[Double]("est_union") === estU)
    val io = BigDecimal(estA + estB - estU)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r.getAs[Double]("est_overlap") - io) <= 1e-9)
  }

  test("overlap: identical scopes estimate zero extra; disjoint keys " +
    "estimate near-zero overlap") {
    val keys = spark.range(20000).selectExpr("CAST(id AS STRING) AS k",
      "id % 2 = 0 AS even")
    // A == B: union == both components, overlap == the common estimate.
    val same = Hll.overlapEstimate(keys, lit(true), lit(true), col("k"),
      m = 256).first()
    assert(same.getAs[Double]("est_a") === same.getAs[Double]("est_union"))
    assert(math.abs(same.getAs[Double]("est_overlap")
      - same.getAs[Double]("est_a")) <= 1e-9)
    // Disjoint scopes: true overlap 0; sketch error compounds ~3x over
    // the ~6.5% SE at m=256, so allow |overlap| <= 25% of a component.
    val dis = Hll.overlapEstimate(keys, col("even"), !col("even"),
      col("k"), m = 256).first()
    assert(math.abs(dis.getAs[Double]("est_overlap"))
      <= 0.25 * dis.getAs[Double]("est_a"),
      s"overlap=${dis.getAs[Double]("est_overlap")}")
  }

  test("sketch is deterministic: identical digest across runs") {
    val o = Tables.orders(spark, sfDir)
    val a = Hll.distinctEstimate(o, col("o_custkey")).first()
    val b = Hll.distinctEstimate(o, col("o_custkey")).first()
    assert(a.getAs[Long]("denom_e27") === b.getAs[Long]("denom_e27"))
    assert(a.getAs[Double]("est_hll") === b.getAs[Double]("est_hll"))
  }

  test("SQL generators embed multi-line caller fragments verbatim " +
    "(no stripMargin pipe-loss)") {
    // Regression for r7's q_hll_sets red row: a caller subquery whose
    // continuation line starts with '||' lost one pipe to the outer
    // template's stripMargin, turning string-concat into bitwise '|'.
    val sub = "(SELECT 'a'\n    || 'b' AS g, k FROM t) s"
    for (sql <- Seq(
        Hll.groupedDistinctEstimateSql(sub, "g", "k"),
        Hll.distinctEstimateSql(sub, "k"),
        Hll.overlapEstimateSql(sub, "g = 'x'", "g = 'y'", "k"))) {
      assert(sql.contains(sub), "caller fragment must survive unchanged")
      assert(!sql.contains("\n    | 'b'"), "pipe must not be consumed")
    }
  }
}
