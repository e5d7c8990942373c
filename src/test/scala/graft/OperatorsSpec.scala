package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Sessionize}

class OperatorsSpec extends SparkSpec {

  test("AsOf same-ts tie rule: a right row at the same ts counts as prior iff its seq is smaller") {
    import spark.implicits._
    val left = Seq((1L, 100L, 5L, "p1"), (1L, 40L, 2L, "p0"))
      .toDF("key", "ts", "seq", "payload")
    val right = Seq((1L, 100L, 3L), (1L, 100L, 7L), (1L, 50L, 4L))
      .toDF("key", "ts", "seq")
    val out = AsOf.joinPrior(left, right, "key", "ts", "seq",
      Map("seq" -> "r_seq")).orderBy("seq").collect()
    // left seq=2 at ts=40: no prior right row at all
    assert(out(0).isNullAt(out(0).fieldIndex("r_seq")))
    // left seq=5 at ts=100: right (100,3) is prior (smaller seq),
    // right (100,7) is not
    assert(out(1).getAs[Long]("r_seq") === 3L)
  }

  test("AsOf keys are isolated") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (2L, 100L, 11L)).toDF("key", "ts", "seq")
    val right = Seq((1L, 90L, 1L)).toDF("key", "ts", "seq")
    val out = AsOf.joinPrior(left, right, "key", "ts", "seq",
      Map("seq" -> "r_seq")).orderBy("seq").collect()
    assert(out(0).getAs[Long]("r_seq") === 1L)   // key 1 sees its click
    assert(out(1).isNullAt(out(1).fieldIndex("r_seq"))) // key 2 sees nothing
  }

  test("AsOf tolerance: in-range match attaches with matched_ts, stale " +
    "match nulls out, boundary gap == tolerance stays matched") {
    import spark.implicits._
    val left = Seq((1L, 100L, 10L), (1L, 500L, 11L), (1L, 1000L, 12L))
      .toDF("key", "ts", "seq")
    val right = Seq((1L, 90L, 1L)).toDF("key", "ts", "seq")
    val out = AsOf.joinPriorWithin(left, right, "key", "ts", "seq",
        Map("seq" -> "r_seq"), toleranceUs = 410L)
      .orderBy("seq").collect()
    // ts=100: gap 10 <= 410 → matched, matched_ts carried
    assert(out(0).getAs[Long]("r_seq") === 1L)
    assert(out(0).getAs[Long]("matched_ts") === 90L)
    // ts=500: gap 410 == tolerance → still matched (inclusive bound)
    assert(out(1).getAs[Long]("r_seq") === 1L)
    // ts=1000: gap 910 > 410 → stale, payload AND matched_ts null
    assert(out(2).isNullAt(out(2).fieldIndex("r_seq")))
    assert(out(2).isNullAt(out(2).fieldIndex("matched_ts")))
  }

  test("AsOf nearest: picks the closer side, backward wins exact ties, " +
    "one-sided and empty keys degrade correctly") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // prev at 90 (d=10), next at 130 (d=30) → prev
      (1L, 125L, 11L), // prev at 90 (d=35), next at 130 (d=5)  → next
      (1L, 110L, 12L), // prev at 90 (d=20), next at 130 (d=20) → tie → prev
      (2L, 100L, 13L), // only a forward row (200)              → next
      (3L, 100L, 14L)  // no right rows at all                  → null
    ).toDF("key", "ts", "seq")
    val right = Seq((1L, 90L, 1L), (1L, 130L, 2L), (2L, 200L, 3L))
      .toDF("key", "ts", "seq")
    val out = AsOf.joinNearest(left, right, "key", "ts", "seq",
      Map("seq" -> "r_seq")).orderBy("seq").collect()
    assert(out(0).getAs[Long]("r_seq") === 1L)
    assert(out(0).getAs[String]("direction") === "prev")
    assert(out(1).getAs[Long]("r_seq") === 2L)
    assert(out(1).getAs[String]("direction") === "next")
    assert(out(2).getAs[Long]("r_seq") === 1L) // tie → backward
    assert(out(2).getAs[String]("direction") === "prev")
    assert(out(3).getAs[Long]("r_seq") === 3L)
    assert(out(3).getAs[Long]("matched_ts") === 200L)
    assert(out(4).isNullAt(out(4).fieldIndex("r_seq")))
    assert(out(4).isNullAt(out(4).fieldIndex("direction")))
  }

  test("Sessionize boundary: gap == gapUs stays in-session, gap > gapUs splits") {
    import spark.implicits._
    val gap = 1000L
    val ev = Seq(
      (1L, 0L, 1L), (1L, 1000L, 2L),          // gap == gapUs -> same session
      (1L, 2001L, 3L),                          // gap 1001 > gapUs -> new
      (2L, 0L, 4L))
      .toDF("user", "ts", "seq")
    val out = Sessionize.assign(ev, "user", "ts", "seq", gap)
      .orderBy("seq").collect()
    assert(out.map(_.getAs[Long]("session_id")).toSeq === Seq(1L, 1L, 2L, 1L))
  }

  test("statsSkewAware equals stats for several bucket sizes") {
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "ts_us", "event_id", "value")
    val base = Sessionize.stats(ev, "user_id", "ts_us", "event_id",
      gapUs = 30L * 60 * 1000000, valueCol = "value")
    for (bucketUs <- Seq(3600L * 1000000, 6L * 3600 * 1000000, 86400L * 1000000)) {
      val skew = Sessionize.statsSkewAware(ev, "user_id", "ts_us", "event_id",
        gapUs = 30L * 60 * 1000000, valueCol = "value", bucketUs = bucketUs)
      assert(skew.exceptAll(base).count() === 0, s"bucket=$bucketUs extra rows")
      assert(base.exceptAll(skew).count() === 0, s"bucket=$bucketUs missing rows")
    }
  }

  test("Frontier.schedule: per-host politeness spacing, budget cycles, " +
    "and priority order; a giant host cannot starve the cycle") {
    import spark.implicits._
    import graft.operators.Frontier
    val pending = (
      (1 to 10).map(i => (s"u$i", "big.com", 7L, 1000L - i)) ++ // 10 urls
        Seq(("v1", "tiny.org", 5L, 50L))
      ).toDF("url", "host", "delay_s", "priority")
    val out = Frontier.schedule(pending, "host", "delay_s",
        orderCols = Seq(col("priority").desc, col("url")),
        budgetPerCycle = 4, cyclePeriodS = 3600L)
      .select("url", "host", "fetch_rank", "fetch_cycle", "fetch_at_s")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // highest priority (u1) fetches first on its host at t=0
    assert(out.find(_._1 == "u1").get._3 === 0L)
    // big.com's 10 urls span ceil(10/4)=3 cycles — bounded per cycle
    val big = out.filter(_._2 == "big.com")
    assert(big.map(_._4).distinct.sorted === Seq(0L, 1L, 2L))
    assert(big.count(_._4 == 0L) === 4)
    // politeness: within a cycle, consecutive fetches are delay apart
    val cycle0 = big.filter(_._4 == 0L).sortBy(_._3).map(_._5)
    assert(cycle0 === Seq(0L, 7L, 14L, 21L))
    // tiny.org is untouched by big.com's queue — cycle 0, t=0
    assert(out.find(_._1 == "v1").get._5 === 0L)
  }

  test("Sessionize.stats aggregates per session") {
    import spark.implicits._
    val ev = Seq((1L, 0L, 1L, 2.0), (1L, 10L, 2L, 3.0), (1L, 5000L, 3L, 4.0))
      .toDF("user", "ts", "seq", "value")
    val out = Sessionize.stats(ev, "user", "ts", "seq", gapUs = 1000L,
      valueCol = "value").orderBy("session_id").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Long]("n_events") === 2L)
    assert(out(0).getAs[Long]("session_start_us") === 0L)
    assert(out(0).getAs[Long]("session_end_us") === 10L)
    assert(out(1).getAs[Long]("n_events") === 1L)
  }

  test("RangeJoin.overlapPairs == theta-join baseline, each pair exactly " +
    "once, across bucket sizes") {
    import graft.operators.RangeJoin
    import spark.implicits._
    // intervals engineered to hit the edge cases: touching endpoints
    // (closed-interval overlap), containment, spans over many buckets,
    // same-bucket disjoint, exact bucket-boundary starts
    val l = Seq((1L, 0L, 100L), (2L, 50L, 60L), (3L, 200L, 210L),
        (4L, 90L, 300L), (5L, 100L, 100L))
      .toDF("l_id", "l_s", "l_e")
    val r = Seq((10L, 100L, 150L), (11L, 0L, 10L), (12L, 55L, 58L),
        (13L, 211L, 220L), (14L, 0L, 400L))
      .toDF("r_id", "r_s", "r_e")
    val theta = l.join(r, col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))
      .select("l_id", "r_id")
    for (w <- Seq(7L, 64L, 1000L)) {
      val got = RangeJoin.overlapPairs(l, "l_s", "l_e", r, "r_s", "r_e", w)
        .select("l_id", "r_id")
      // exactly-once: multiset equality against the theta baseline
      assert(got.exceptAll(theta).count() === 0, s"bucket $w: extra pairs")
      assert(theta.exceptAll(got).count() === 0, s"bucket $w: missing pairs")
    }
  }
}
