package graft

import org.apache.spark.sql.functions._

import graft.operators.Cms

/** Count-min sketch contracts: estimates never under-count, are exact
  * when the grid is collision-free, and cell-wise merge reproduces the
  * single-sketch answer exactly. */
class CmsSpec extends SparkSpec {

  private def keysDf(ks: Long*) = {
    import spark.implicits._
    ks.map(Tuple1(_)).toDF("k")
  }

  test("estimates are exact with few keys in a wide grid") {
    val df = keysDf(1L, 1L, 1L, 2L, 2L, 3L)
    val sketch = Cms.digest(df, "k", depth = 4, width = 4096)
    val est = Cms.estimates(sketch, df.distinct(), "k", depth = 4,
        width = 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est == Map(1L -> 3L, 2L -> 2L, 3L -> 1L))
  }

  test("estimates never under-count, even in a tiny colliding grid") {
    val df = keysDf((1L to 200L).flatMap(k => Seq.fill(k.toInt % 5 + 1)(k)): _*)
    val exact = df.groupBy("k").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sketch = Cms.digest(df, "k", depth = 3, width = 16)
    val est = Cms.estimates(sketch, df.distinct(), "k", depth = 3,
        width = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"under-count for $k: ${est(k)} < $n")
    }
    // a 3x16 grid holding 200 keys MUST over-count somewhere
    assert(exact.exists { case (k, n) => est(k) > n })
  }

  test("streaming sketch equals the batch sketch exactly") {
    // The build is an additive groupBy(count), so the SAME code runs
    // over an unbounded stream in complete mode with depth·width rows
    // of state; parity with the batch digest is exact, not
    // approximate (the HLL streaming-registers treatment).
    import org.apache.spark.sql.streaming.Trigger
    val dir = java.nio.file.Files.createTempDirectory("cms-stream").toString
    val ev = Tables.events(spark, sfDir).select(col("user_id"))
    ev.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = Cms.digest(stream, "user_id")
      .writeStream.format("memory").queryName("cms_regs_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("cms_regs_stream")
    val batch = Cms.digest(ev, "user_id")
    assert(streamed.count() === batch.count())
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("cell-wise merge equals the single sketch exactly") {
    val df = keysDf((1L to 100L).flatMap(k => Seq.fill((k % 3 + 1).toInt)(k)): _*)
    val whole = Cms.digest(df, "k")
    val merged = Cms.merge(
      Cms.digest(df.where(col("k") % 2 === 0), "k"),
      Cms.digest(df.where(col("k") % 2 === 1), "k"))
    val a = whole.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = merged.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
  }

  test("heavy hitters: no false negatives under ADVERSARIAL partitioning") {
    // The pigeonhole candidate stage must survive the worst split: a
    // heavy key's occurrences spread EVENLY across all partitions (each
    // local count sits exactly at the floor), decoys sitting just
    // below the local floor in every partition, and a key concentrated
    // in one partition. Exact expected = plain groupBy/HAVING.
    import spark.implicits._
    val p = 8
    val minCount = 24L // floor = 24/8 = 3 per partition
    val rows =
      Seq.fill(24)(7L) ++           // heavy, will spread 3-per-partition
      Seq.fill(16)(11L) ++          // light: 2 per partition everywhere
      Seq.fill(30)(13L) ++          // heavy, above floor everywhere
      Seq.fill(23)(17L)             // just below threshold (false pos bait)
    // repartition(p) round-robins → even spread, the adversarial case
    val df = rows.map(Tuple1(_)).toDF("k").repartition(p)
    val got = Cms.heavyHitters(df, "k", minCount, depth = 3, width = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.groupBy("k").count().where(col("count") >= minCount)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(want.keySet === Set(7L, 13L)) // the fixture is non-vacuous
    // concentrated key: all mass in one partition still surfaces
    val skewed = (Seq.fill(25)(99L) ++ (1L to 200L)).map(Tuple1(_))
      .toDF("k").repartition(p, col("k"))
    val got2 = Cms.heavyHitters(skewed, "k", minCount).collect()
    assert(got2.map(_.getLong(0)).toSet === Set(99L))
  }

  test("heavy-hitter candidate stage: floor prunes locally-light keys") {
    import spark.implicits._
    // 4 partitions, floor = ceil(40/4) = 10: key 1 is locally heavy in
    // one partition only; keys 100..163 appear once each (never emitted)
    val df = (Seq.fill(12)(1L) ++ (100L to 163L)).map(Tuple1(_)).toDF("k")
      .repartition(4, col("k"))
    val cands = Cms.localHeavyCandidates(df, "k", minCount = 40L)
      .collect().map(_.getLong(0)).toSet
    assert(cands === Set(1L))
  }

  test("Misra-Gries candidates: superset at bounded state, even when " +
    "distinct keys far exceed capacity") {
    import graft.operators.Cms
    import spark.implicits._
    // KEY-EXPLOSIVE partitions: ~100k distinct singleton keys against a
    // capacity of 256 counters — the exact-map seam would hold 100k
    // entries; the summary holds ≤ 256. Heavies + at-the-floor decoys
    // ride inside the noise.
    val p = 4
    val minCount = 400L // floor = 100 per partition
    val rows =
      Seq.fill(500)(7L) ++                    // globally heavy
      Seq.fill(399)(11L) ++                   // just below threshold
      Seq.fill(120)(13L) ++                   // locally heavy in 1 part'n
      (100000L to 200000L)                    // 100k singletons
    val df = rows.map(Tuple1(_)).toDF("k").repartition(p)
    val mg = Cms.localHeavyCandidatesMG(df, "k", minCount, capacity = 256)
      .collect().map(_.getLong(0)).toSet
    // superset of every key with a partition-local count >= floor —
    // compare against the exact-map candidate stage
    val exact = Cms.localHeavyCandidates(df, "k", minCount)
      .collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(mg), s"MG lost candidates: ${exact -- mg}")
    // the end-to-end heavy hitters are EXACT through the MG stage
    val got = Cms.heavyHitters(df, "k", minCount, mgCapacity = Some(256))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.groupBy("k").count().where(col("count") >= minCount)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
    assert(want.keySet === Set(7L)) // non-vacuous
    // a capacity too small for the floor fails LOUDLY, never silently
    // drops a candidate (d >= floorCnt would void the superset proof)
    val e = intercept[Throwable] {
      Cms.localHeavyCandidatesMG(df, "k", minCount, capacity = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("too small")), msgs(e).mkString("|"))
  }

  test("Misra-Gries adversarial mix (capacity-wide head + singleton " +
    "flood) runs in bounded time — the decrement is amortized O(1)") {
    import graft.operators.Cms
    // The naive decrement-all form sweeps O(capacity) per flood row
    // once the table is full of live head counters: 500k floods ×
    // 65536 counters ≈ 3e10 map ops — minutes-to-hours. The lazy-debt
    // bucket form pays O(1) amortized; this completes in seconds.
    val capacity = 1 << 16
    val head = spark.range(0, capacity.toLong * 6)
      .select((col("id") % capacity).as("k"))
    val flood = spark.range(0, 500000L)
      .select((col("id") + 1000000000L).as("k"))
    val df = head.unionAll(flood).coalesce(1) // one worst-case partition
    val t0 = System.nanoTime()
    // floor = 600k (1 partition): d ≈ 434k stays under it — lossless
    val n = Cms.localHeavyCandidatesMG(df, "k", minCount = 600000L,
      capacity = capacity).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(n === 0L) // nothing reaches the floor; the POINT is the time
    assert(secs < 60, f"adversarial MG took $secs%.1f s — the decrement " +
      "sweep is back")
  }

  test("join-size estimate is exact in a wide grid, upper bound in a tiny one") {
    // a: keys 1..20 once each; b: key k appears k%4+1 times
    val a = keysDf(1L to 20L: _*)
    val b = keysDf((1L to 30L).flatMap(k => Seq.fill((k % 4 + 1).toInt)(k)): _*)
    val exactWant = (1L to 20L).map(k => k % 4 + 1).sum
    val wide = Cms.joinSizeEstimate(a, "k", b, "k", depth = 4, width = 4096)
      .collect().head
    assert(wide.getLong(0) === exactWant)      // n_exact
    assert(wide.getLong(1) === exactWant)      // collision-free → est == exact
    val tiny = Cms.joinSizeEstimate(a, "k", b, "k", depth = 3, width = 8)
      .collect().head
    assert(tiny.getLong(0) === exactWant)
    assert(tiny.getLong(1) >= exactWant)       // collisions only add
  }
}
