package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: time individual pipeline stages of the near-dup operators. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $name ($n rows)")
    }
    // Generated-corpus curve mode: `runMain graft.Probe _ gendocs=2000000,10000000`
    // prices exact dedup + MinHash-LSH banding over the zero-I/O
    // GenDocsSource at each size (the cdc_gen_snapshot scale-curve
    // discipline applied to the dedup path — BENCH_NOTES.md).
    if (args.length > 1 && args(1).startsWith("gendocs=")) {
      val sizes = args(1).stripPrefix("gendocs=").split(",").map(_.toLong)
      def corpus(n: Long) = spark.read.format("graft.sources.GenDocsSource")
        .option("docs", n).option("slices", cpus.toInt).load()
      sizes.foreach { n =>
        corpus(math.min(n, 100000L)).count() // warm codegen/planner
        time(s"gen_dedup_exact n=$n") {
          operators.Dedup.exact(corpus(n), "doc_id", "text")
            .select(count(lit(1)), sum(col("n_copies"))).first().getLong(0)
        }
        time(s"gen_minhash_bands n=$n") {
          operators.MinHash.bandRows(
              operators.MinHash.signature(corpus(n), "doc_id", "text"))
            .select(count(lit(1))).first().getLong(0)
        }
      }
      spark.stop()
      return
    }
    // ANN index-lifecycle curve: `runMain graft.Probe _ genann=2000000,20000000`
    // prices C104's build-once / search-many split at each corpus size
    // over zero-I/O formula vectors (dim 64): (a) PQ-encode the corpus
    // and persist the codes artifact — the one-time index build; (b)
    // serve an 8-probe ADC top-5 search from the RELOADED artifact —
    // the per-query cost a deployment actually pays (bytes scanned per
    // query = |corpus|·16 code bytes, never the 256-byte vectors).
    if (args.length > 1 && args(1).startsWith("genann=")) {
      val sizes = args(1).stripPrefix("genann=").split(",").map(_.toLong)
      import graft.operators.Pq
      def corpus(n: Long) = spark.range(n).select(col("id").as("vec_id"),
        array((0 until 64).map(d =>
          (((col("id") * (2 * d + 1) + d) % 997).cast("double") / 997.0)
            .cast("float")): _*).as("embedding"))
      val probes = corpus(8)
      sizes.foreach { n =>
        val codesDir = s"/tmp/graft_probe_pq_codes_$n"
        Pq.encode(corpus(math.min(n, 100000L)), "vec_id", "embedding")
          .agg(count(lit(1))).first() // warm codegen/planner
        time(s"pq_index_build n=$n") {
          Pq.encode(corpus(n), "vec_id", "embedding")
            .write.mode("overwrite").parquet(codesDir)
          spark.read.parquet(codesDir).count()
        }
        time(s"pq_index_search n=$n probes=8 topk=5") {
          Pq.searchCodes(spark.read.parquet(codesDir), probes,
            "vec_id", "embedding", topK = 5).count()
        }
      }
      spark.stop()
      return
    }

    // PageRank curve: `runMain graft.Probe _ genpr=5000000,20000000` —
    // prices C105's per-iteration O(|E|) equi-join + groupBy(dst) over
    // a zero-I/O formula digraph (avg degree 10, weights 1..5, ~1/e of
    // nodes dangling via the hash wrap) at each edge count.
    if (args.length > 1 && args(1).startsWith("genpr=")) {
      val sizes = args(1).stripPrefix("genpr=").split(",").map(_.toLong)
      sizes.foreach { e =>
        val v = math.max(e / 10, 1)
        val edges = spark.range(e).selectExpr(
          s"id % $v AS src",
          s"(id * 2654435761) % $v AS dst",
          "1 + id % 5 AS w")
        val nodes = spark.range(v).select(col("id").as("v"))
        time(s"pagerank iters=3 edges=$e nodes=$v") {
          operators.Graph.pagerank(nodes, edges, iters = 3).count()
        }
      }
      spark.stop()
      return
    }

    // B-family analytics curves: `runMain graft.Probe _ genbench=2000000,8000000,32000000`
    // prices the three headline B shapes over zero-I/O generated frames
    // at each size (VERDICT r11 ask #8) and reports each run's shuffle
    // exchanges from the EXECUTED plan's task metrics, so the
    // constant-exchange claims are checked numbers, not prose:
    //  - B10 as-of join (union + ONE key shuffle + one window pass;
    //    exchange rows = |left|+|right|, never a per-row range probe)
    //  - B64 grouped top-k via the bounded TypedImperativeAggregate
    //    (exchange rows ≤ |groups|·maps partial states, each ≤ k+1 values)
    //  - B5 windowed rank top-3 (partial WindowGroupLimit: exchange rows
    //    ≤ |keys|·(3+1)·maps, never |input|)
    if (args.length > 1 && args(1).startsWith("genbench=")) {
      val sizes = args(1).stripPrefix("genbench=").split(",").map(_.toLong)
      import org.apache.spark.sql.expressions.Window
      import graft.functions.BoundedTopK
      import org.apache.spark.sql.GraftSqlBridge
      def timeShuffles(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
        val t0 = System.nanoTime()
        // drive THIS QueryExecution (a count()/noop write would plan a
        // separate execution and its metrics would read zero)
        val out = df.queryExecution.toRdd.count()
        val secs = (System.nanoTime() - t0) / 1e9
        def walk(p: SparkPlan): Seq[SparkPlan] = {
          val kids = p match {
            case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
            case q: QueryStageExec => Seq(q.plan)
            case o => o.children
          }
          p +: (kids ++ p.subqueries).flatMap(walk)
        }
        val uniq = walk(df.queryExecution.executedPlan)
          .collect { case s: ShuffleExchangeLike => s }
          .foldLeft(Vector.empty[ShuffleExchangeLike]) { (acc, s) =>
            if (acc.exists(_ eq s)) acc else acc :+ s }
        val rows = uniq.map(
          _.metrics.get("shuffleRecordsWritten").map(_.value).getOrElse(0L))
          .filter(_ > 0)
        println(f"$secs%8.2f s  $name ($out rows out; " +
          s"shuffle rows: ${rows.mkString(" + ")})")
      }
      def frame(n: Long, keys: Long) = spark.range(n).select(
        (col("id") % keys).as("key"),
        (col("id") * 2654435761L % 1000000007L).as("ts"),
        col("id").as("seq"),
        (col("id") * 48271L % 99991L).as("value"))
      sizes.foreach { n =>
        val keys = math.max(n / 64, 1L) // ~64 rows/key
        val groups = math.max(keys / 16, 1L)
        // warm pass at a bounded size (codegen + planner)
        val warmN = math.min(n, 200000L)
        operators.AsOf.joinPrior(frame(warmN, 997), frame(warmN / 4, 997)
            .withColumnRenamed("value", "q"), "key", "ts", "seq",
          Map("q" -> "quote")).queryExecution.toRdd.count()
        timeShuffles(s"asof_join_prior n=$n keys=$keys") {
          operators.AsOf.joinPrior(frame(n, keys), frame(n / 4, keys)
              .withColumnRenamed("value", "q"), "key", "ts", "seq",
            Map("q" -> "quote"))
        }
        timeShuffles(s"grouped_topk k=5 n=$n groups=$groups") {
          val topk = GraftSqlBridge.column(
            BoundedTopK(GraftSqlBridge.expression(col("value")), 5)
              .toAggregateExpression())
          frame(n, keys).groupBy((col("key") % groups).as("g"))
            .agg(topk.as("top5"))
        }
        // denser keys for the rank shape (~1024 rows/key): the partial
        // WindowGroupLimit keeps ≤ k+1 rows per key per map, so the cap
        // only BINDS when rows/key/map exceeds it — at 64 rows/key over
        // 32 maps every map holds 2/key and the exchange equals input
        val rankKeys = math.max(n / 1024, 1L)
        timeShuffles(s"windowed_rank top3 n=$n keys=$rankKeys") {
          val w = Window.partitionBy(col("key"))
            .orderBy(col("value").desc, col("seq"))
          frame(n, rankKeys).withColumn("rnk", row_number().over(w))
            .where(col("rnk") <= 3)
        }
      }
      spark.stop()
      return
    }

    // Misra-Gries adversarial curve: `runMain graft.Probe _ genmg=2000000,8000000`
    // prices the BOUNDED candidate stage on its worst-case mix — a
    // capacity-wide live head (64k keys × 6) followed by N distinct
    // singletons, ALL in one partition — the input whose naive
    // decrement-all sweep is O(N·capacity). The lazy-debt bucket form
    // (r14) must show a LINEAR law: rows/s flat across sizes.
    if (args.length > 1 && args(1).startsWith("genmg=")) {
      val sizes = args(1).stripPrefix("genmg=").split(",").map(_.toLong)
      val capacity = 1 << 16
      def mix(n: Long) = spark.range(0, capacity.toLong * 6)
        .select((col("id") % capacity).as("k"))
        .unionAll(spark.range(0, n)
          .select((col("id") + 4000000000L).as("k")))
        .coalesce(1)
      mix(100000L).count() // warm
      sizes.foreach { n =>
        time(s"mg_candidates flood=$n capacity=$capacity (1 partition)") {
          operators.Cms.localHeavyCandidatesMG(mix(n), "k",
            minCount = 2L * n, capacity = capacity).count()
        }
      }
      spark.stop()
      return
    }

    // Appending-produce curve: `runMain graft.Probe _ genappend=2000000,8000000,32000000`
    // prices the A68 produce path against a STANDING topic of each
    // size: (a) ends-derivation — the column-pruned grouped max over
    // the standing log's __offset (the O(|log| I/O) fallback append()
    // pays); (b) the produce itself via appendWithEnds — routing +
    // one window over ONLY the 200k incoming rows (the deployment
    // path, where ends are broker metadata). The law to pin: (b) is
    // FLAT in the standing size; (a) grows with the log but stays
    // one-column cheap.
    if (args.length > 1 && args(1).startsWith("genappend=")) {
      val sizes = args(1).stripPrefix("genappend=").split(",").map(_.toLong)
      def log(n: Long, idOffset: Long = 0L) =
        spark.read.format("graft.sources.GenSource")
          .option("rows", n).option("users", 99991)
          .option("slices", cpus.toInt).load()
          .select(col("user_id").as("key"),
            (col("ts_us") + idOffset).as("commit_ts_us"),
            (col("event_id") + idOffset).as("seq"),
            col("event_type"))
      val topic = graft.cdc.GraftSink.Topic(path = "", numPartitions = 32)
      sizes.foreach { n =>
        val standingDir = s"/tmp/graft_probe_append_$n"
        topic.assign(log(n))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .partitionBy("__partition").parquet(standingDir)
        val standing = spark.read.parquet(standingDir)
        var ends: org.apache.spark.sql.DataFrame = null
        time(s"append_ends_scan standing=$n") {
          ends = standing.groupBy(col("__partition").as("__end_p"))
            .agg((max(col("__offset")) + 1L).as("__base"))
            .localCheckpoint()
          ends.count()
        }
        // the incoming produce strictly follows the standing log
        val incoming = log(200000L, idOffset = 4000000000000000L)
        time(s"append_produce standing=$n incoming=200k") {
          topic.appendWithEnds(ends, incoming)
            .agg(count(lit(1)), max(col("__offset"))).first()
          200000L
        }
      }
      spark.stop()
      return
    }

    // Versioned-table merge curve: `runMain graft.Probe _ gentable=2000000,8000000`
    // prices the A66 merge forms against a STANDING bucketed table of
    // each size: (a) mergeBucketed of a 10k-key batch confined to ONE
    // bucket — must cost O(|bucket| + |batch|), i.e. ~1/64 of the
    // table; (b) the plain full merge of the same batch — O(|table|)
    // rewrite, the contrast that justifies the bucketed path at scale.
    if (args.length > 1 && args(1).startsWith("gentable=")) {
      val sizes = args(1).stripPrefix("gentable=").split(",").map(_.toLong)
      import graft.cdc.GraftSink
      sizes.foreach { n =>
        val dir = s"/tmp/graft_probe_table_$n"
        val root = new org.apache.hadoop.fs.Path(dir)
        root.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(root, true)
        val vt = GraftSink.VersionedTable(dir)
        def rows(r: org.apache.spark.sql.DataFrame) = r.select(
          col("id").as("key"), col("id").as("seq"), lit("I").as("op"),
          concat(lit("p"), col("id")).as("payload"))
        time(s"table_bootstrap standing=$n") {
          vt.mergeBucketed(rows(spark.range(n).toDF()), Seq("key"), Seq("seq"))
          n
        }
        // 10k NEW keys all hashing into bucket 0 (of the default 64)
        val batch = rows(spark.range(n, n + 4000000L).toDF()
          .where(pmod(xxhash64(col("id")), lit(64L)) === 0).limit(10000))
          .localCheckpoint()
        time(s"bucketed_merge standing=$n batch=10k one-bucket") {
          vt.mergeBucketed(batch, Seq("key"), Seq("seq")); 10000L
        }
        // (c) CDF across that merge commit: diffs ONLY the rewritten
        // bucket's removed ∪ added files — must stay ~flat (the r15
        // fallback re-diffed the whole table keyed, O(|table|))
        val vMerge = vt.currentVersion(spark)
        time(s"cdf_merge_pruned standing=$n") {
          vt.changes(spark, vMerge - 1, vMerge, keyCols = Seq("key"))
            .agg(count(lit(1))).first()
          10000L
        }
        // (c2) STREAMING CDF drain of the same merge version through
        // the chunked reader (the r17 flagship weak leg): key-hash
        // chunks bound reader MEMORY at maxChunkRows whatever the
        // bucket grows to; decode work is O(|touched bucket|) rows —
        // inherent (the diff of a bucket IS the bucket), the law to
        // watch is bucket-linear time with flat memory, never an OOM
        time(s"cdf_stream_merge standing=$n") {
          val qn = s"probe_cdf_stream_$n"
          val q = graft.sources.TableCdfSource.stream(spark, dir,
            vt.read(spark).schema, keyCols = Seq("key"),
            startingVersion = vMerge)
            .writeStream.format("memory").queryName(qn)
            .option("checkpointLocation", java.nio.file.Files
              .createTempDirectory("ckptprobe").toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
            .start()
          q.awaitTermination()
          spark.table(qn).count()
        }
        // (d) OPTIMIZE bin-packs WITHIN buckets (O(|table|) rewrite,
        // inherent), and the merge AFTER it must still be on the flat
        // curve — the r15 finding was optimize destroying the layout
        time(s"optimize_bucketed standing=$n") {
          vt.optimize(spark, 2000000L); n
        }
        val batch2 = rows(spark.range(n + 4000000L, n + 8000000L).toDF()
          .where(pmod(xxhash64(col("id")), lit(64L)) === 0).limit(10000))
          .localCheckpoint()
        time(s"bucketed_merge_post_optimize standing=$n batch=10k one-bucket") {
          vt.mergeBucketed(batch2, Seq("key"), Seq("seq")); 10000L
        }
        // (e,f) REPEATED keyed DV erasures — the r16 weak leg: the old
        // cumulative single-partition sidecar priced delete k at
        // O(|all rows ever deleted|) through one task; per-bucket
        // slices must price EACH delete at O(|its buckets|), flat in
        // both table size and delete history (the repeat must not be
        // slower than the first)
        time(s"dv_delete_first standing=$n keys=100") {
          vt.deleteKeys(spark, Seq("key"),
            (0L until 100L).map(k => Seq[Any](k))); 100L
        }
        time(s"dv_delete_repeat standing=$n keys=100") {
          vt.deleteKeys(spark, Seq("key"),
            (100L until 200L).map(k => Seq[Any](k))); 100L
        }
        // (g) CDF across the delete version: fresh slices only
        val vDel = vt.currentVersion(spark)
        time(s"cdf_delete_pruned standing=$n") {
          vt.changes(spark, vDel - 1, vDel, keyCols = Seq("key"))
            .agg(count(lit(1))).first(); 100L
        }
        time(s"full_merge standing=$n batch=10k") {
          vt.merge(batch, Seq("key"), Seq("seq")); 10000L
        }
        // (h) STATS-PRUNED predicate erasure on a RANGE-CLUSTERED
        // table (r17 ask 2): the position scan plans only the files
        // whose footer range can hold a match — the census stays
        // ~1/64 of the table at every size, so the erasure prices at
        // O(candidate files), not O(n) (the un-pruned r17 scan read
        // every file)
        val rcDir = s"/tmp/graft_probe_rc_$n"
        val rcRoot = new org.apache.hadoop.fs.Path(rcDir)
        rcRoot.getFileSystem(spark.sessionState.newHadoopConf())
          .delete(rcRoot, true)
        val rc = GraftSink.VersionedTable(rcDir)
        rc.commit(spark.range(n).toDF("key")
          .withColumn("qty", col("key") * 2)
          .repartitionByRange(64, col("key")))
        time(s"dv_predicate_prune standing=$n") {
          val (_, killed) = rc.deleteWhere(spark,
            col("key") >= lit(n - 1000L))
          val census =
            GraftSink.VersionedTable.lastPredicateScanFiles.get()
          println(s"          dv_predicate_prune census=$census files")
          killed
        }
      }
      spark.stop()
      return
    }

    // Envelope codec curve: `runMain graft.Probe _ genenvelope=2000000,8000000`
    // prices the A50 canal-json codec at each size over the zero-I/O
    // GenSource changelog: (a) ENCODE — one to_json projection — into
    // a materialized wire (as a wire is); (b) DECODE+snapshot — one
    // barrier-pinned from_json + the A2 max_by — from the wire. Proves
    // the OptimizerBarrier single-parse fix holds at scale (a re-parse
    // regression shows as a super-linear decode law, the r13 22×).
    if (args.length > 1 && args(1).startsWith("genenvelope=")) {
      val sizes = args(1).stripPrefix("genenvelope=").split(",").map(_.toLong)
      val payload = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("props",
          org.apache.spark.sql.types.StringType)))
      def log(n: Long) = spark.read.format("graft.sources.GenSource")
        .option("rows", n).option("users", 99991)
        .option("slices", cpus.toInt).load()
        .select(col("user_id").as("key"), col("ts_us").as("commit_ts_us"),
          col("event_id").as("seq"),
          when(col("event_type") === "signup", "I")
            .when(col("event_type") === "error", "D").otherwise("U").as("op"),
          col("event_type"), (col("value_e2") / 100.0).as("value"),
          concat(lit("{\"k\":"), col("user_id"), lit("}")).as("props"))
      sizes.foreach { n =>
        val wireDir = s"/tmp/graft_probe_envelope_$n"
        graft.cdc.Envelope.encode(log(math.min(n, 100000L)), "graft",
          "events", Seq("event_type", "value", "props"))
          .agg(count(lit(1))).first() // warm codegen/planner
        time(s"envelope_encode n=$n") {
          graft.cdc.Envelope.encode(log(n), "graft", "events",
              Seq("event_type", "value", "props"))
            .select(graft.cdc.Envelope.EnvelopeCol)
            .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
            .parquet(wireDir)
          n
        }
        time(s"envelope_decode_snapshot n=$n") {
          graft.cdc.Materialize.snapshot(
            graft.cdc.Envelope.decode(spark.read.parquet(wireDir),
              payload, "graft", "events")).count()
        }
      }
      spark.stop()
      return
    }

    // JDBC extract curve: `runMain graft.Probe _ genjdbc=2000000:1,2000000:8`
    // prices the A51 range-partitioned warehouse extract at each
    // (rows, numPartitions): the generated changelog is loaded into an
    // embedded-Derby table once per size, then extracted with
    // partitionColumn=key across P remote queries — the law is the
    // parallel-extract speedup P buys until the single-JVM warehouse
    // saturates.
    if (args.length > 1 && args(1).startsWith("genjdbc=")) {
      val specs = args(1).stripPrefix("genjdbc=").split(",")
        .map { s => val Array(n, p) = s.split(":").map(_.toLong); (n, p.toInt) }
      var loaded = -1L
      var url = ""
      specs.foreach { case (n, p) =>
        if (n != loaded) {
          val db = s"/tmp/graft_probe_jdbc_$n/derby"
          try java.sql.DriverManager.getConnection(
            s"jdbc:derby:$db;shutdown=true")
          catch { case _: java.sql.SQLException => () }
          val dir = java.nio.file.Paths.get(s"/tmp/graft_probe_jdbc_$n")
          if (java.nio.file.Files.exists(dir)) {
            java.nio.file.Files.walk(dir)
              .sorted(java.util.Comparator.reverseOrder())
              .forEach(f => java.nio.file.Files.delete(f))
          }
          url = s"jdbc:derby:$db;create=true"
          val log = spark.read.format("graft.sources.GenSource")
            .option("rows", n).option("users", 99991)
            .option("slices", cpus.toInt).load()
            .select(col("user_id").as("key"), col("ts_us").as("commit_ts_us"),
              col("event_id").as("seq"), (col("value_e2") / 100.0).as("value"))
          time(s"jdbc_load n=$n") {
            log.write.mode(org.apache.spark.sql.SaveMode.Append)
              .jdbc(url, "probe_src", new java.util.Properties())
            n
          }
          loaded = n
        }
        time(s"jdbc_extract n=$n partitions=$p") {
          spark.read
            .option("partitionColumn", "key")
            .option("numPartitions", p)
            .option("lowerBound", 0L)
            .option("upperBound", 99991L)
            .jdbc(url, "probe_src", new java.util.Properties())
            .count()
        }
      }
      spark.stop()
      return
    }

    // Topic consumer throughput: `runMain graft.Probe _ gentopic=2000000:500000`
    // prices the A46 broker loop end to end at each size — PRODUCE a
    // generated changelog into the 8-partition Topic sink (routing +
    // dense offsets + partitioned write), then TAIL it through
    // TopicSource (footer-stats end-of-log discovery, offset-predicate
    // scan, R offsets admitted per trigger) into a noop sink. The two
    // timings split the broker loop's cost the way a deployment sees
    // it: produce once, consume per subscriber.
    if (args.length > 1 && args(1).startsWith("gentopic=")) {
      val Array(n, r) = args(1).stripPrefix("gentopic=").split(":").map(_.toLong)
      val topicDir = s"/tmp/graft_probe_topic_$n"
      val log = spark.read.format("graft.sources.GenSource")
        .option("rows", n).option("users", 99991)
        .option("slices", cpus.toInt).load()
        .select(col("user_id").as("key"), col("ts_us").as("commit_ts_us"),
          col("event_id").as("seq"),
          when(col("event_type") === "signup", "I")
            .when(col("event_type") === "error", "D").otherwise("U").as("op"),
          col("event_type"), (col("value_e2") / 100.0).as("value"),
          lit(null).cast("string").as("props"))
      time(s"topic_produce n=$n parts=8") {
        graft.cdc.GraftSink.Topic(topicDir, numPartitions = 8).write(log)
        n
      }
      val t0 = System.nanoTime()
      val q = graft.sources.TopicSource.stream(spark, topicDir,
          graft.sources.TopicSource.changelogTopicSchema,
          maxOffsetsPerTrigger = r)
        .writeStream.format("noop")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("topic_probe").toString)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val batches = q.recentProgress.count(_.numInputRows > 0)
      println(f"$secs%8.2f s  topic_consume n=$n batch=$r " +
        f"($batches batches, ${n / secs}%.0f rows/s)")
      spark.stop()
      return
    }

    // Cold-start metadata scale: `runMain graft.Probe _ gentopicmeta=2000000:500`
    // prices the consumer's FIRST end-of-log discovery on a topic of
    // MANY SMALL FILES (N rows at ~F rows/file): one footer read per
    // file, batched through the bounded parallel pool. Each
    // endOffsets call constructs a fresh stream, so every sample is a
    // true cold start; the steady-state poll (memoized, one footer per
    // NEW file) is covered by gentopic=.
    if (args.length > 1 && args(1).startsWith("gentopicmeta=")) {
      val Array(n, fpf) = args(1).stripPrefix("gentopicmeta=")
        .split(":").map(_.toLong)
      val topicDir = s"/tmp/graft_probe_topicmeta_${n}_$fpf"
      val log = spark.read.format("graft.sources.GenSource")
        .option("rows", n).option("users", 99991)
        .option("slices", cpus.toInt).load()
        .select(col("user_id").as("key"), col("ts_us").as("commit_ts_us"),
          col("event_id").as("seq"), lit("U").as("op"),
          col("event_type"), (col("value_e2") / 100.0).as("value"),
          lit(null).cast("string").as("props"))
      val assigned = graft.cdc.GraftSink.Topic(topicDir, numPartitions = 8)
        .assign(log)
      time(s"topicmeta_produce n=$n rows/file=$fpf") {
        assigned.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .option("maxRecordsPerFile", fpf)
          .partitionBy("__partition").parquet(topicDir)
        n
      }
      val nFiles = {
        val root = new org.apache.hadoop.fs.Path(topicDir)
        val fs = root.getFileSystem(
          spark.sessionState.newHadoopConf())
        fs.listStatus(root).filter(_.isDirectory).map(d =>
          fs.listStatus(d.getPath).count(s => s.isFile &&
            s.getPath.getName.endsWith(".parquet"))).sum
      }
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val ends = graft.sources.TopicSource.endOffsets(spark, topicDir)
          .collect()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"$secs%8.2f s  topicmeta_cold_discover files=$nFiles " +
          f"run=$i (${nFiles / secs}%.0f footers/s, " +
          f"${ends.length} partitions)")
      }
      spark.stop()
      return
    }

    // Streaming-throughput mode: `runMain graft.Probe _ genstream=2000000:200000`
    // drains a GenSource micro-batch stream of N rows (R rows/batch)
    // through the A12 tumbling-window aggregation into a memory sink —
    // prices the state-store path end to end (offsets, planning, state
    // read/write) rather than a single batch plan.
    if (args.length > 1 && args(1).startsWith("genstream=")) {
      val Array(n, r) = args(1).stripPrefix("genstream=").split(":").map(_.toLong)
      time(s"gen_stream_windowed n=$n batch=$r") {
        val q = spark.readStream.format("graft.sources.GenSource")
          .option("rows", n).option("users", 1000).option("slices", cpus.toInt)
          .option("rowsPerBatch", r).load()
          .withColumn("minute", (col("ts_us") / 60000000L).cast("long"))
          .groupBy("minute", "event_type")
          .agg(count(lit(1)).as("n"), sum(col("value_e2")).as("sum_e2"))
          .writeStream.format("memory").queryName("gen_probe_win")
          .outputMode("complete")
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
          .start()
        try q.processAllAvailable() finally q.stop()
        spark.table("gen_probe_win").count()
      }
      spark.stop()
      return
    }
    // Stream-stream interval-join throughput:
    // `runMain graft.Probe _ genjoin=2000000:200000` drives A30's
    // dual-watermark attribution join from two zero-I/O GenSource
    // feeds (N rows per feed, R rows/batch) into a noop sink — prices
    // the symmetric stream-join state path (store puts/gets, watermark
    // eviction) at micro-batch granularity, and prints the MAX
    // state-store rows seen across batches: the boundedness claim
    // (state = O(delay + window) of event time, never O(history))
    // measured from the engine's own progress metrics.
    if (args.length > 1 && args(1).startsWith("genjoin=")) {
      val Array(n, r) = args(1).stripPrefix("genjoin=").split(":").map(_.toLong)
      // users=997 (coprime to the 5-cycle of event types): every
      // purchase at index i has exactly ONE matching click (i-997,
      // 997 s earlier — inside the 1 h window), so the probe pays for
      // real match emission, not just state churn. A users value
      // divisible by 5 would make purchases and clicks user-disjoint.
      def feed() = spark.readStream.format("graft.sources.GenSource")
        .option("rows", n).option("users", 997).option("slices", cpus.toInt)
        .option("rowsPerBatch", r).load()
        .select(col("user_id"), timestamp_micros(col("ts_us")).as("ts"),
          col("event_id"), col("event_type"))
      val joined = streaming.CdcStream.attributionJoin(
        purchases = feed().where(col("event_type") === "purchase"),
        clicks = feed().where(col("event_type") === "click"),
        delay = "1 hour", window = "1 hour")
      val t0 = System.nanoTime()
      val q = joined.writeStream.format("noop")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
        .start()
      try q.processAllAvailable() finally q.stop()
      val secs = (System.nanoTime() - t0) / 1e9
      val progress = q.recentProgress
      val maxState = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
        .foldLeft(0L)(math.max)
      val outRows = progress.map(_.sink.numOutputRows).filter(_ > 0).sum
      println(f"$secs%8.2f s  gen_stream_join n=$n batch=$r " +
        f"(${progress.length} batches, ${2 * n / secs}%.0f gen rows/s, " +
        f"$outRows matches, max state rows $maxState)")
      spark.stop()
      return
    }
    // Query mode: `runMain graft.Probe <sfdir> q1,q2` times the named
    // SparkEntry queries (3 passes each, noop write like Bench);
    // SPARK_GRAFT_EXPLAIN=1 also dumps the formatted plan.
    if (args.length > 1) {
      val names = args(1).split(",").toSeq
      names.foreach { q =>
        if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
          SparkEntry.queries(q)(spark, sfDir).explain("formatted")
        (1 to 3).foreach { p =>
          // Rebuild inside the timer: streaming queries do their real
          // work (slice, drain) during construction, like Bench sees.
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $q pass $p")
        }
      }
      spark.stop()
      return
    }
    val docs = Tables.documents(spark, sfDir)
    import graft.operators.{Dedup, MinHash}
    // warmup
    docs.count()
    time("shingles only") {
      docs.select(col("doc_id"), operators.MinHash.shingles(col("text")).as("s"))
        .select(sum(size(col("s")))).first(); docs.count() }
    time("hashedShingles") {
      docs.select(col("doc_id"), MinHash.hashedShingles(col("text")).as("hv"))
        .select(sum(size(col("hv")))).first(); docs.count() }
    time("signature (hv+mh)") {
      MinHash.signature(docs, "doc_id", "text")
        .select(sum(size(col("mh")))).first(); docs.count() }
    time("bandRows") {
      MinHash.bandRows(MinHash.signature(docs, "doc_id", "text"))
        .select(count(lit(1))).first().getLong(0) }
    time("minhash full") {
      MinHash.neardupPairs(docs, "doc_id", "text", 0.5).count() }
    time("ngram sets") {
      docs.select(col("doc_id"), MinHash.hashedShingles(col("text"), 2).as("hv"))
        .select(sum(size(col("hv")))).first(); docs.count() }
    time("ngram full") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 2, 0.05).count() }
    spark.stop()
  }
}
