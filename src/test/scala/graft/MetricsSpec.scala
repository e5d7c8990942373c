package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** MEASURED shuffle bounds — SURVEY §5 promises per-operator exchange
  * shapes ("snapshot exchanges ≈ |keys| partial-agg rows", "dedup
  * shuffles carry digests, never text", "LSH candidates stay under the
  * banding caps"). PlanAudit gates plan SHAPES statically; this spec
  * EXECUTES the headline queries at sf0.01 and asserts the promises
  * from the executed plan's SQL metrics (records + bytes per shuffle
  * exchange), so a plan change that silently inflates a promised bound
  * red-lines here instead of surfacing as a 100 TB incident.
  *
  * The bounds are stated in the operators' own units (|keys|·maps,
  * |groups|·k·maps, bytes/row) rather than absolute numbers, so they
  * hold at any SF; maps = upstream map-side partition count, the
  * partial-agg fan-in factor. */
class MetricsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  case class Shuffle(node: String, records: Long, dataBytes: Long) {
    def bytesPerRow: Double =
      if (records == 0) 0.0 else dataBytes.toDouble / records
  }

  /** Execute `df` and return every shuffle exchange's (records written,
    * in-memory data size), final-AQE-plan-accurate (query stages and
    * reuse followed, double counts dropped by identity). */
  private def shuffles(df: DataFrame): Seq[Shuffle] = {
    df.collect()
    def walk(p: SparkPlan): Seq[ShuffleExchangeLike] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      val here = p match {
        case s: ShuffleExchangeLike => Seq(s)
        case _ => Nil
      }
      here ++ (kids ++ p.subqueries).flatMap(walk)
    }
    val uniq = walk(df.queryExecution.executedPlan)
      .foldLeft(Vector.empty[ShuffleExchangeLike]) { (acc, s) =>
        if (acc.exists(_ eq s)) acc else acc :+ s
      }
    uniq.map { s =>
      def m(k: String): Long =
        s.metrics.get(k).map(_.value).getOrElse(0L)
      Shuffle(s.nodeName, m("shuffleRecordsWritten"), m("dataSize"))
    }.filter(_.records > 0)
  }

  private def debug(name: String, ss: Seq[Shuffle]): Unit =
    info(s"$name: " + ss.map(s =>
      f"${s.records}%d rows, ${s.dataBytes}%d B (${s.bytesPerRow}%.0f B/row)")
      .mkString(" | "))

  private def changelog: DataFrame =
    graft.cdc.Changelog.fromEvents(Tables.events(spark, sf))

  test("A2 snapshot: every exchange stays at partial-agg scale, ≪ |log|") {
    val log = changelog
    val totalRows = log.count()
    val keys = log.select("key").distinct().count()
    val maps = log.rdd.getNumPartitions
    val ss = shuffles(graft.cdc.Materialize.snapshot(changelog))
    debug("cdc_snapshot", ss)
    assert(ss.nonEmpty)
    // map-side max_by combine: each map partition emits at most |keys|
    // partial rows, so NO exchange may carry more than |keys|·maps —
    // and the changelog itself (totalRows ≫ keys) must never shuffle
    ss.foreach { s =>
      assert(s.records <= keys * maps,
        s"snapshot exchange ${s.records} rows > |keys|*maps = ${keys * maps}")
      assert(s.records < totalRows,
        s"snapshot shuffled the full changelog ($totalRows rows)")
    }
  }

  test("B64 grouped top-k: exchange rows ≤ |groups|·(k+1)·maps") {
    val e = Tables.events(spark, sf)
    val groups = e.select("event_type").distinct().count()
    val maps = e.rdd.getNumPartitions
    val k = 5
    val df = SparkEntry.queries("q_topk_agg")(spark, sf)
    val ss = shuffles(df)
    debug("q_topk_agg", ss)
    assert(ss.nonEmpty)
    // the bounded-state top-k agg carries ≤ k+1 buffer entries per
    // (group, map partition) into its exchange — |events| never moves
    val total = e.count()
    ss.foreach { s =>
      assert(s.records <= groups * (k + 1) * maps * 4,
        s"top-k exchange ${s.records} rows; bound ${groups * (k + 1) * maps * 4}")
      assert(s.records < total / 10,
        s"top-k exchange ${s.records} rows is input-scale ($total input rows)")
    }
  }

  test("C1 exact dedup: exchanges carry digest-width rows, never text") {
    val docs = Tables.documents(spark, sf)
    val avgText = docs.select(avg(length(col("text")))).first().getDouble(0)
    val df = SparkEntry.queries("doc_dedup_exact")(spark, sf)
    val ss = shuffles(df)
    debug("doc_dedup_exact", ss)
    assert(ss.nonEmpty)
    assert(avgText > 200, s"testdata drift: avg text len $avgText")
    // text collapses to a 64-hex sha256 at the scan: every exchange row
    // must be digest-shaped (digest + id + small agg state), nowhere
    // near the document width
    ss.foreach { s =>
      assert(s.bytesPerRow < 200,
        f"dedup exchange carries ${s.bytesPerRow}%.0f B/row — text-width " +
          f"(avg doc ${avgText}%.0f B) instead of digest-width")
    }
  }

  test("A39 generated snapshot: the exchange is CONSTANT-SIZE in feed rows") {
    // The BENCH_NOTES scale-curve argument made into an assertion: the
    // A2 max_by materialization over a 2M-row generated feed must
    // shuffle at most |users|·maps partial rows — the exchange size is
    // a function of key cardinality, NOT feed size (the property that
    // carries the curve to 100 TB).
    val users = 1000L
    val feed = spark.read.format("graft.sources.GenSource")
      .option("rows", 2000000L).option("users", users)
      .option("slices", 8).load()
    val maps = feed.rdd.getNumPartitions
    val snap = feed.groupBy(col("user_id"))
      .agg(max_by(struct(col("ts_us"), col("event_id")),
        struct(col("ts_us"), col("event_id"))).as("last"))
    val ss = shuffles(snap)
    debug("gen_snapshot_2m", ss)
    assert(ss.nonEmpty)
    ss.foreach { s =>
      assert(s.records <= users * maps,
        s"snapshot exchange ${s.records} rows > |users|*maps = ${users * maps} " +
          "— the exchange scales with the feed, not the keys")
    }
  }

  test("C25 incremental dedup: every exchange digest-width, ≤ batch+corpus") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val avgText = docs.select(avg(length(col("text")))).first().getDouble(0)
    val ss = shuffles(SparkEntry.queries("doc_dedup_incremental")(spark, sf))
    debug("doc_dedup_incremental", ss)
    assert(ss.nonEmpty)
    // batch side dedups to (digest, min id, count), corpus side to bare
    // digests — the anti-join shuffles 32-byte digests, never text, and
    // never more rows than batch (2·|docs|) + corpus (|docs|/2) deliver
    ss.foreach { s =>
      assert(s.records <= nDocs * 3,
        s"incremental-dedup exchange ${s.records} rows > batch+corpus scale")
      assert(s.bytesPerRow < 200,
        f"incremental-dedup exchange ${s.bytesPerRow}%.0f B/row — " +
          f"text-width (avg doc ${avgText}%.0f B) instead of digest-width")
    }
  }

  test("C15 IVF ANN: no exchange above assignment scale") {
    val emb = Tables.embeddings(spark, sf)
    val nVecs = emb.count()
    val ss = shuffles(SparkEntry.queries("emb_ann_ivf")(spark, sf))
    debug("emb_ann_ivf", ss)
    // list assignment is scan-local and the probe side broadcasts, so
    // nothing input-sized multiplies: every exchange stays ≤ |corpus|
    // (plus bounded per-probe candidate frames); a records blow-up here
    // means the bucket join degenerated toward all-pairs
    ss.foreach { s =>
      assert(s.records <= nVecs * 2,
        s"IVF exchange ${s.records} rows > 2·|corpus| = ${nVecs * 2}")
    }
  }

  test("C106 prefix join: every exchange stays at token scale, shingle-width") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val tokRows = docs.select(col("doc_id"),
        explode(operators.MinHash.shingles(col("text"), 3)).as("t"))
      .distinct().count()
    val avgText = docs.select(avg(length(col("text")))).first().getDouble(0)
    val ss = shuffles(SparkEntry.queries("doc_prefix_jaccard")(spark, sf))
    debug("doc_prefix_jaccard", ss)
    assert(ss.nonEmpty)
    // the lossless-pruning promise, measured: prefix postings are rare
    // shingles, so candidates ≪ all-pairs and NO exchange — tokenize,
    // df/size aggs, prefix self-join output, or verify joins — may
    // exceed a small multiple of the (doc, shingle) frame itself. Rows
    // are (id, shingle)-shaped EXCEPT the r11 verify path's per-doc
    // sorted-hash ARRAYS: |docs| rows whose total payload is the token
    // frame re-packed at 8 B/shingle (wide rows, bounded TOTAL bytes —
    // asserted as such, not exempted)
    ss.foreach { s =>
      assert(s.records <= tokRows * 3,
        s"prefix-join exchange ${s.records} rows > 3·|tok| = ${tokRows * 3} " +
          "— candidate generation degenerated toward all-pairs")
      val hashArrayFrame = s.records <= nDocs * 2 &&
        s.dataBytes <= tokRows * 8 * 8 // 8 B/shingle + row overhead slack
      assert(s.bytesPerRow < 200 || hashArrayFrame,
        f"prefix-join exchange ${s.bytesPerRow}%.0f B/row × ${s.records} " +
          f"rows — document-width (avg doc ${avgText}%.0f B) instead of " +
          "shingle-width, and not the bounded per-doc hash-array frame")
    }
  }

  test("C105 pagerank: total shuffled rows stay at iters·(|E|+|V|) scale") {
    // pagerank materializes each iteration (localCheckpoint), so its
    // exchanges never appear in one final plan — measure them across
    // ALL jobs with a listener instead: the §5 claim is one O(|E|)
    // rank⋈edges shuffle plus O(|V|)-scale agg/rank frames per round,
    // so total shuffle WRITE records across the whole run must stay
    // within a small multiple of iters·(|E| + |V|)·maps-fan-in — an
    // all-pairs or replicated-join regression blows this bound up.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val e = 200000L
    val v = 20000L
    val edges = spark.range(e).selectExpr(s"id % $v AS src",
      s"(id * 2654435761) % $v AS dst", "1 + id % 5 AS w")
    val nodes = spark.range(v).select(col("id").as("v"))
    val written = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          written.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val n = operators.Graph.pagerank(nodes, edges, iters = 3).count()
      assert(n === v)
    } finally {
      // listener events are async — give the bus a beat to drain
      Thread.sleep(500)
      spark.sparkContext.removeSparkListener(listener)
    }
    val total = written.get()
    val bound = 3L * (e + 6 * v) * 2
    info(s"pagerank shuffle-write records: $total (bound $bound)")
    assert(total > 0, "listener saw no shuffle writes")
    assert(total <= bound,
      s"pagerank shuffled $total rows > bound $bound — an exchange " +
        "is no longer at |E|/|V| scale")
  }

  test("B68 summary routing: the routed aggregate reads summary-scale rows") {
    // the routing promise, measured from file-scan metrics: after the
    // rule fires, the aggregate's scan delivers |summary| rows (the
    // (priority, status) grain), never the base table's row count.
    // The q_summary_route QUERY now materializes through the route and
    // deregisters (the r10 ADVICE stale-route fix), returning a
    // checkpoint with no file scan — so this spec drives the rule
    // directly: register a scratch summary, build the aggregate,
    // measure, deregister.
    import graft.plans.SummaryRouting
    val base = sf + "/orders.parquet"
    SummaryRouting.deregister(base)
    val sumDir = java.nio.file.Files
      .createTempDirectory("orders_summary_metrics").toString
    Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"),
        max(col("o_totalprice")).as("max_tp"),
        min(col("o_totalprice")).as("min_tp"))
      .write.mode("overwrite").parquet(sumDir)
    SummaryRouting.register(spark, SummaryRouting.Route(
      baseDir = base, summaryDir = sumDir,
      keys = Map("o_orderpriority" -> "o_orderpriority",
        "o_orderstatus" -> "o_orderstatus"),
      aggs = Map(("count", "*") -> "cnt",
        ("max", "o_totalprice") -> "max_tp",
        ("min", "o_totalprice") -> "min_tp")))
    val df = try {
      val routed = Tables.orders(spark, sf)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          max(col("o_totalprice")).as("max_price"),
          min(col("o_totalprice")).as("min_price"))
      routed.collect()
      routed
    } finally SummaryRouting.deregister(base)
    val baseRows = Tables.orders(spark, sf).count()
    val summaryRows = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderstatus").distinct().count()
    def scans(p: SparkPlan): Seq[Long] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      val here = p match {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics.get("numOutputRows").map(_.value).toSeq
        case _ => Nil
      }
      here ++ (kids ++ p.subqueries).flatMap(scans)
    }
    val scanned = scans(df.queryExecution.executedPlan).sum
    info(s"q_summary_route: scanned $scanned rows " +
      s"(summary grain $summaryRows, base $baseRows)")
    assert(scanned == summaryRows,
      s"routed aggregate scanned $scanned rows; expected the " +
        s"$summaryRows-row summary grain (base table has $baseRows)")
  }

  test("B58 heavy hitters: candidate exchange ≪ distinct keys (pigeonhole)") {
    // r11 finding: probing EVERY distinct key re-created the
    // full-cardinality shuffle the sketch exists to avoid. The
    // pigeonhole candidate stage must keep the candidate exchange
    // strictly below the distinct-key cardinality — only keys locally
    // heavy in some partition (count ≥ ceil(minCount/P)) may travel.
    val li = Tables.lineitem(spark, sf).select("l_partkey")
      .repartition(8).localCheckpoint() // fix P; cut the repartition
                                        // exchange out of the measured plan
    val distinctKeys = li.distinct().count()
    val cand = graft.operators.Cms.localHeavyCandidates(
      li, "l_partkey", minCount = 45L)
    val ss = shuffles(cand)
    debug("cms_candidates", ss)
    assert(ss.nonEmpty)
    ss.foreach { s =>
      assert(s.records < distinctKeys / 2,
        s"candidate exchange ${s.records} rows is not ≪ $distinctKeys " +
          "distinct keys — the floor stopped pruning")
    }
    // and the stage is a true superset of the exact answer (no false
    // negatives end-to-end at the real partitioning)
    val want = li.groupBy("l_partkey").count().where(col("count") >= 45)
      .select("l_partkey").collect().map(_.getLong(0)).toSet
    val got = cand.collect().map(_.getLong(0)).toSet
    assert(want.subsetOf(got))
  }

  test("C2 MinHash LSH: band exchange ≤ |docs|·bands, signature-width") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()
    val bands = operators.MinHash.numBands
    val df = SparkEntry.queries("doc_minhash_lsh")(spark, sf)
    val ss = shuffles(df)
    debug("doc_minhash_lsh", ss)
    assert(ss.nonEmpty)
    // banding replicates each doc exactly `bands` times (plus bounded
    // candidate-pair frames downstream); nothing may exceed that scale.
    // Width binds only at input scale: a ≥|docs|-row exchange carrying
    // text-width rows is the 100 TB killer, while the few surviving
    // candidate pairs may legitimately carry both signatures into the
    // verify stage.
    ss.foreach { s =>
      assert(s.records <= nDocs * bands * 2,
        s"LSH exchange ${s.records} rows > 2·|docs|·bands = ${nDocs * bands * 2}")
      if (s.records >= nDocs)
        assert(s.bytesPerRow < 600,
          f"input-scale LSH exchange (${s.records} rows) carries " +
            f"${s.bytesPerRow}%.0f B/row — wider than a banded signature row")
    }
  }
}
