package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, MinHash}

class DecontaminateSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)

  test("an eval set copied from train flags exactly the copied docs") {
    import spark.implicits._
    // plant: 10 train docs leak verbatim into the "benchmark"
    val leaked = docs.orderBy("doc_id").limit(10).cache()
    val eval = leaked.withColumn("doc_id", col("doc_id") + 1000000L)
    val flagged = Decontaminate.overlaps(docs, eval,
      "doc_id", "text", n = 3, minOverlap = 5).cache()
    val leakedIds = leaked.select("doc_id").as[Long].collect().toSet
    val flaggedIds = flagged.select("doc_id").as[Long].collect().toSet
    // every leaked doc is caught (they share ALL their grams)
    assert(leakedIds.subsetOf(flaggedIds), s"missed ${leakedIds -- flaggedIds}")
    // a caught leaked doc overlaps on its full shingle set
    val want = leaked
      .select(col("doc_id"), size(MinHash.hashedShingles(col("text"), 3)).as("n"))
      .as[(Long, Int)].collect().toMap
    flagged.as[(Long, Long)].collect().foreach { case (id, n) =>
      if (leakedIds(id)) assert(n === want(id).toLong, s"doc $id")
    }
  }

  test("an eval set with disjoint vocabulary flags nothing") {
    import spark.implicits._
    val eval = Seq((1L, "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"))
      .toDF("doc_id", "text")
    val flagged = Decontaminate.overlaps(docs, eval,
      "doc_id", "text", n = 3, minOverlap = 1)
    assert(flagged.count() === 0)
  }
}
