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

  test("sketch is deterministic: identical digest across runs") {
    val o = Tables.orders(spark, sfDir)
    val a = Hll.distinctEstimate(o, col("o_custkey")).first()
    val b = Hll.distinctEstimate(o, col("o_custkey")).first()
    assert(a.getAs[Long]("denom_e27") === b.getAs[Long]("denom_e27"))
    assert(a.getAs[Double]("est_hll") === b.getAs[Double]("est_hll"))
  }
}
