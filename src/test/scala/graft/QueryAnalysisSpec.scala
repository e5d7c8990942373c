package graft

import java.nio.file.{Files, Paths}

import scala.util.{Failure, Success, Try}

/** Spark-side twin of [[OracleSqlSpec]] (VERDICT r8 ask #2): every
  * [[SparkEntry.queries]] entry must ANALYZE against the real testdata
  * schema. Analysis — not execution — is exactly where round 8's 46
  * ERR(ts) failures lived (`Tables.load`'s nanos projection vs the
  * regenerated `timestamp[us]` events parquet), so a driver-side
  * testdata schema drift now reddens `sbt test` in-round instead of
  * surfacing as CORRECTNESS errors a round later.
  *
  * Only `.queryExecution.analyzed` is forced; no job runs. Queries whose
  * builders are eagerly iterative (k-means, BPE) or side-effecting
  * (streaming drains, index writes, localCheckpoints) still do that
  * bounded sf0.001 work once, which is the price of binding them against
  * the real schema — and exactly once: the builders are invoked in ONE
  * shared pass and both tests read the memoized frames (ADVICE r11 #4;
  * invoking `fn` per-test re-ran every streaming drain for a schema
  * read).
  */
class QueryAnalysisSpec extends SparkSpec {

  /** One builder invocation per query, shared by every test below. */
  private lazy val built: Seq[(String, Try[org.apache.spark.sql.DataFrame])] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> Try(fn(spark, sfDir))
    }

  test("every SparkEntry query analyzes against the sf0.001 testdata schema") {
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir missing")
    val failures = built.flatMap {
      case (name, Success(df)) =>
        Try(df.queryExecution.analyzed) match {
          case Success(_) => None
          case Failure(e) =>
            val msg = Option(e.getMessage).getOrElse("").linesIterator
              .take(3).mkString(" / ").take(400)
            Some(s"$name: ${e.getClass.getSimpleName}: $msg")
        }
      case (name, Failure(e)) =>
        val msg = Option(e.getMessage).getOrElse("").linesIterator
          .take(3).mkString(" / ").take(400)
        Some(s"$name: ${e.getClass.getSimpleName}: $msg")
    }
    assert(
      failures.isEmpty,
      s"${failures.size}/${SparkEntry.queries.size} queries failed analysis:\n" +
        failures.mkString("\n"))
  }

  test("no query output carries a top-level array/map/struct column") {
    // Every past hash-instability at the driver boundary was an
    // output-contract class: r2 decimal rendering, r3 raw arrays, r10
    // the wav features array<float> (driver comparator: unhashable
    // numpy.ndarray). Scalars are the contract — arrays cross the
    // boundary csv-stringified or digested (SURVEY §6; see
    // Media.featuresCsv for the float-lossless form). This red-lines
    // the remaining unguarded class mechanically.
    assume(Files.exists(Paths.get(sfDir)), s"$sfDir missing")
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = built.flatMap {
      case (name, Success(df)) =>
        df.schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType]
            || f.dataType.isInstanceOf[MapType]
            || f.dataType.isInstanceOf[StructType] =>
            s"$name.${f.name}: ${f.dataType.simpleString}"
        }
      case (_, Failure(_)) => Nil // reported by the analysis test above
    }
    assert(offenders.isEmpty,
      s"${offenders.size} non-scalar output columns would break the " +
        s"driver comparator:\n${offenders.mkString("\n")}")
  }
}
