package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  private def orders = Tables.orders(spark, sfDir)
    .select(col("o_custkey").as("c_custkey"), col("o_orderkey"))
  private def customer = Tables.customer(spark, sfDir)
    .select("c_custkey", "c_mktsegment")

  test("saltedJoin inner: row-identical to the plain join") {
    val plain = orders.join(customer, "c_custkey")
    val salted = Skew.saltedJoin(orders, customer, "c_custkey", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("saltedJoin left: unmatched fact rows survive with nulls") {
    import spark.implicits._
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "orphan"))
      .toDF("k", "payload")
    val dim = Seq((1L, "x"), (2L, "y")).toDF("k", "attr")
    val got = Skew.saltedJoin(fact, dim, "k", salts = 4, joinType = "left")
    assert(got.count() === 3)
    assert(got.where(col("k") === 99 && col("attr").isNull).count() === 1)
  }

  test("keyProfile: stats match exact recompute, top-K ordered, " +
    "skewed input flagged") {
    import spark.implicits._
    // 1 viral key (500 rows) + 100 uniform keys (5 rows each)
    val rows = (0 until 500).map(_ => 7L) ++
      (1 to 100).flatMap(k => Seq.fill(5)(1000L + k))
    val df = rows.toDF("k")
    val got = Skew.keyProfile(df, "k", topK = 3).collect()
    assert(got.length === 3)
    assert(got.head.getAs[Long]("key") === 7L)
    assert(got.head.getAs[Long]("cnt") === 500L)
    assert(got.head.getAs[Long]("n_keys") === 101L)
    assert(got.head.getAs[Long]("total_rows") === 1000L)
    assert(got.head.getAs[Long]("max_cnt") === 500L)
    assert(got.head.getAs[Double]("med_cnt") === 5.0)
    // mean = 1000/101 ≈ 9.9 → skew_factor = 500/9.9 ≈ 50.5
    assert(got.head.getAs[Double]("skew_factor") > 50.0)
    assert(got.head.getAs[Double]("share") === 0.5)
    // remaining rows are uniform keys, deterministically tie-broken
    assert(got(1).getAs[Long]("cnt") === 5L)
    assert(got(1).getAs[Long]("key") === 1001L)
    assert(got(2).getAs[Long]("key") === 1002L)
  }

  test("salt actually spreads a viral key across salt values") {
    import spark.implicits._
    // one hot key with many distinct payloads (distinct rows → distinct
    // struct hashes → spread), joined against a 1-row dim
    val fact = (0 until 1000).map(i => (7L, i.toLong)).toDF("k", "payload")
    val dim = Seq((7L, "hot")).toDF("k", "attr")
    val salts = 8
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(col("k"), col("payload"))), lit(salts.toLong)))
    val used = salted.select("__salt").distinct().count()
    assert(used >= salts - 1, s"expected ~$salts salt values in use, got $used")
    // and the join still finds every row
    assert(Skew.saltedJoin(fact, dim, "k", salts).count() === 1000)
  }
}
