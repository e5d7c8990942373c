package graft

class GraftExtensionsSpec extends SparkSpec {

  test("native kernels are SQL-callable after register()") {
    GraftExtensions.register(spark)
    assert(spark.sql(
      "SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))")
      .first().getDouble(0) === 11.0)
    assert(spark.sql(
      "SELECT graft_sorted_intersect_count(array(1L,2L,5L), array(2L,3L,5L))")
      .first().getLong(0) === 2L)
    assert(spark.sql(
      "SELECT size(graft_shingle_hashes('a b c d', 3))")
      .first().getInt(0) === 2)
    assert(spark.sql(
      "SELECT size(graft_minhash(graft_shingle_hashes('a b c d e', 2)))")
      .first().getInt(0) === graft.operators.MinHash.numHashes)
    val half = spark.sql(
      "SELECT graft_simhash_half(array('x','y'), 0)").first().getLong(0)
    assert(half >= 0L && half <= 4294967295L)
    // 7 tokens -> 5 gram hashes -> 2 windows of 4 -> <= 2 fingerprints
    val nFp = spark.sql(
      "SELECT size(graft_winnow('a b c d e f g', 3, 4))").first().getInt(0)
    assert(nFp >= 1 && nFp <= 2)
  }

  test("SQL kernel calls equal the Column-API forms") {
    GraftExtensions.register(spark)
    spark.sql("SELECT text FROM parquet.`" + sfDir + "/documents.parquet` LIMIT 50")
      .createOrReplaceTempView("docs_ext_t")
    val viaSql = spark.sql(
      "SELECT graft_shingle_hashes(text, 3) AS hv FROM docs_ext_t")
    val viaApi = spark.table("docs_ext_t")
      .select(graft.operators.MinHash.hashedShingles(
        org.apache.spark.sql.functions.col("text"), 3).as("hv"))
    assert(viaSql.exceptAll(viaApi).count() === 0)
    assert(viaApi.exceptAll(viaSql).count() === 0)
  }

  test("non-literal shingle width fails loudly") {
    GraftExtensions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_shingle_hashes('a b', CAST(rand()*2 AS INT))")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("literal"))
  }
}
