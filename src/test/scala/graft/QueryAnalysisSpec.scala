package graft

import java.nio.file.{Files, Paths}

/** Spark-side twin of [[OracleSqlSpec]] (VERDICT r8 ask #2): every
  * [[SparkEntry.queries]] entry must ANALYZE against the real testdata
  * schema. Analysis — not execution — is exactly where round 8's 46
  * ERR(ts) failures lived (`Tables.load`'s nanos projection vs the
  * regenerated `timestamp[us]` events parquet), so a driver-side
  * testdata schema drift now reddens `sbt test` in-round instead of
  * surfacing as CORRECTNESS errors a round later.
  *
  * Only `.queryExecution.analyzed` is forced; no job runs. Queries whose
  * builders are eagerly iterative (k-means, BPE) still do their bounded
  * sf0.001 work, which is the price of binding them against the real
  * schema.
  */
class QueryAnalysisSpec extends SparkSpec {

  test("every SparkEntry query analyzes against the sf0.001 testdata schema") {
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir missing")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, sfDir).queryExecution.analyzed
          None
        } catch {
          case e: Exception =>
            val msg = Option(e.getMessage).getOrElse("").linesIterator
              .take(3).mkString(" / ").take(400)
            Some(s"$name: ${e.getClass.getSimpleName}: $msg")
        }
    }
    assert(
      failures.isEmpty,
      s"${failures.size}/${SparkEntry.queries.size} queries failed analysis:\n" +
        failures.mkString("\n"))
  }
}
