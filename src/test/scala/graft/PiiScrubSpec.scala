package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

class PiiScrubSpec extends SparkSpec {

  private def scrub(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(Text.scrubPii(col("t"))).first().getString(0)
  }

  test("emails are redacted") {
    assert(scrub("contact me at jane.doe+spam@example.co.uk today") ===
      "contact me at <EMAIL> today")
  }

  test("phone numbers in common shapes are redacted") {
    assert(scrub("call 555-123-4567 now") === "call <PHONE> now")
    assert(scrub("call +1 (555) 123 4567 now") === "call <PHONE> now")
  }

  test("ssn-shaped ids are redacted") {
    assert(scrub("ssn 123-45-6789 on file") === "ssn <SSN> on file")
  }

  test("clean text passes through untouched") {
    val t = "the quick brown fox jumps over the lazy dog"
    assert(scrub(t) === t)
    // the whole synthetic corpus is PII-free
    val docs = Tables.documents(spark, sfDir)
    assert(docs.where(Text.scrubPii(col("text")) =!= col("text")).count() === 0)
  }
}
