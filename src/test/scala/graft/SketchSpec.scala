package graft

import org.apache.spark.sql.functions._

/** Approximate sketch operators (B14): at 100 TB, exact distinct counts
  * and exact percentiles are shuffles of the full key space — the HLL /
  * quantile-sketch forms are the operational defaults. Their outputs are
  * engine-specific (no DuckDB hash oracle possible), so the contract
  * tested here is bounded relative error vs the exact computation. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val o = Tables.orders(spark, sfDir)
    val exact = o.select(countDistinct("o_custkey")).first().getLong(0)
    val approx = o.select(approx_count_distinct("o_custkey", rsd = 0.02))
      .first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact percentile") {
    val o = Tables.orders(spark, sfDir)
    val exact = o.select(expr("percentile(o_totalprice, 0.5)"))
      .first().getDouble(0)
    val approx = o.select(
      expr("approx_percentile(o_totalprice, 0.5, 1000)"))
      .first().getDouble(0)
    assert(math.abs(approx - exact) / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }
}
