package graft

import org.apache.spark.sql.functions._
import scala.util.hashing.MurmurHash3

import graft.operators.SeriesLsh

/** LSH-blocked time-series similarity (B46): recall on a planted
  * highly-correlated pair, precision against independent noise series,
  * and the hot-bucket cap's fail-soft behavior. */
class SeriesLshSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic pseudo-random count in [1, 10] (no Random — specs
    * must be replay-stable). */
  private def noise(seed: String, day: Int): Long =
    (math.abs(MurmurHash3.stringHash(s"$seed|$day")) % 10).toLong + 1

  private lazy val daily = {
    val spine = 0 until 60
    // Users 1 and 2: same base pattern, user 2 bumped every 7th day —
    // Pearson ~0.97. Users 10..39: independent noise series.
    val planted = spine.flatMap { d =>
      val base = noise("base", d)
      Seq((1L, d.toLong, base),
        (2L, d.toLong, base + (if (d % 7 == 0) 1L else 0L)))
    }
    val others = for (u <- 10 until 40; d <- spine)
      yield (u.toLong, d.toLong, noise(s"u$u", d))
    (planted ++ others).toDF("user_id", "day", "cnt")
  }

  test("planted correlated pair is found with its exact Pearson") {
    val out = SeriesLsh.correlatedPairs(daily, threshold = 0.9).collect()
    val hit = out.find(r => r.getAs[Long]("user_a") == 1L &&
      r.getAs[Long]("user_b") == 2L)
    assert(hit.isDefined, s"planted pair (1,2) missed; got ${out.toSeq}")
    assert(hit.get.getAs[Double]("corr") >= 0.9)
    assert(hit.get.getAs[Long]("n") === 60L)
  }

  test("independent noise series produce no 0.9-correlated pairs") {
    val out = SeriesLsh.correlatedPairs(daily, threshold = 0.9).collect()
    val noisePairs = out.filter(r => r.getAs[Long]("user_a") >= 10L)
    assert(noisePairs.isEmpty,
      s"noise series should not correlate at 0.9: ${noisePairs.toSeq}")
  }

  test("hot-bucket cap drops crowded buckets instead of pairing them") {
    // 200 IDENTICAL constant-slope series all land in the same buckets
    // in every band; with maxBucket=50 the crowd is dropped wholesale,
    // so no pairs emerge — fail-soft, not a quadratic join.
    val flat = (for (u <- 0 until 200; d <- 0 until 20)
      yield (u.toLong, d.toLong, (d + 1).toLong))
      .toDF("user_id", "day", "cnt")
    val out = SeriesLsh.correlatedPairs(flat, threshold = 0.5,
      maxBucket = 50)
    assert(out.count() === 0L)
  }
}
