package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.cdc.{Changefeed, GraftSink}

/** Streaming changefeed execution (reference README.md:60-70).
  *
  * The reference's Sink contract is a continuous feed: EmitRowChangedEvents
  * delivers ordered row changes, FlushRowChangedEvents returns a
  * resolved-ts below which everything has been observed. Spark-first that
  * is Structured Streaming: a file/kafka source per changefeed, the SAME
  * plugin chain as batch (plugins are `DataFrame => DataFrame`, agnostic
  * to execution mode), delivery through `foreachBatch` into any
  * [[GraftSink]], and the query watermark as the resolved-ts.
  *
  * Scale: each micro-batch is a distributed job; state (windowed aggs)
  * is partitioned by group key across executors; watermarks bound state
  * size — the per-table pipeline split of the reference maps to source
  * partitioning, not driver threads.
  */
object CdcStream {

  /** Open a streaming changelog over a directory of event files — each
    * new file is one upstream flush. `maxFilesPerTrigger=1` keeps batch
    * boundaries aligned with flush boundaries. */
  def fromParquetDir(spark: SparkSession, dir: String, schema: StructType,
                     maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("latestFirst", "false")
      .parquet(dir)

  /** Run chain + sink over every micro-batch until no input remains
    * (Trigger.AvailableNow — processes all available data then stops,
    * exactly-once per the checkpoint). Returns the finished query. */
  def deliver(stream: DataFrame, chain: Changefeed, sink: GraftSink,
              checkpointDir: String): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit =
      (batch, _) => sink.write(chain.run(batch.toDF()))
    stream.writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** [[deliver]] with a dead-letter quarantine (the RFC's "a bad
    * plugin must not crash the feed" at RUNTIME, complementing
    * Prepare-time validation): a micro-batch whose chain or sink write
    * throws is written RAW to `dlq` (suffixed per batch id, append
    * semantics) and the feed keeps going — offsets commit either way,
    * so a poison flush is quarantined exactly once instead of wedging
    * the changefeed in a crash loop. Re-ingesting a fixed DLQ batch is
    * the operator's explicit, auditable action. */
  def deliverWithDlq(stream: DataFrame, chain: Changefeed, sink: GraftSink,
                     dlq: String => GraftSink,
                     checkpointDir: String): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit = (batch, id) => {
      val frame = batch.toDF()
      try sink.write(chain.run(frame))
      catch {
        case scala.util.control.NonFatal(e) =>
          dlq(s"batch-$id").write(
            frame.withColumn("__dlq_reason",
              org.apache.spark.sql.functions.lit(
                String.valueOf(e.getMessage).take(200))))
      }
    }
    stream.writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming feed-health state (A24's streaming form): per-pipeline
    * event counts and frontier ts, maintained as a complete-mode
    * aggregation whose state is exactly |pipelines| rows. The lag
    * column (frontier − feed-wide resolved-ts) is derived OUTSIDE the
    * stream from this tiny table — a global min over an in-flight
    * stateful agg would need a second stateful aggregation, which
    * Structured Streaming doesn't compose; deriving it from the
    * |pipelines|-row state is free and batch-identical
    * (CdcStreamSpec pins parity with Materialize.feedLag). */
  def pipelineFrontiers(stream: DataFrame, numPartitions: Int): DataFrame =
    stream
      .groupBy(pmod(col("key"), lit(numPartitions.toLong)).as("pipeline"))
      .agg(max(col("commit_ts_us")).as("max_ts_us"),
        count(lit(1)).as("n_events"))

  /** Tumbling-window event counts with a watermark — the streaming form
    * of the batch `cdc_tumbling` query (A12 parity). Append mode emits a
    * window only once the watermark passes it: the reference's
    * "flush returns resolved-ts" semantics. */
  def windowedCounts(stream: DataFrame, tsCol: String, windowLen: String,
                     watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"))

  /** Hopping (sliding) window counts with a watermark — the streaming
    * form of the batch `cdc_hopping` query (A12). Identical plan shape
    * to [[windowedCounts]] plus the slide: each event expands into
    * len/slide windows BEFORE the stateful agg, so state stays
    * per-(window, type) and the watermark closes windows exactly as in
    * the tumbling case. */
  def hoppingCounts(stream: DataFrame, tsCol: String, windowLen: String,
                    slide: String, watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("w.start")).as("window_start_us"),
        col("event_type"), col("n_events"))

  /** Gap sessionization on a stream — the streaming form of the batch
    * [[graft.operators.Sessionize]] (A13): `session_window` merges
    * events of a key whose gaps stay below `gap`, and a session is
    * emitted once (append mode) when the watermark passes its close —
    * the "flush returns resolved-ts" contract applied to sessions.
    * State per key is the open sessions only, bounded by the watermark.
    *
    * Boundary convention: an event at EXACTLY `gap` after the previous
    * one opens a new session here ( `[start, last+gap)` windows), while
    * the batch rule (`gap > gapUs` starts a session) keeps it — only
    * exact-to-the-microsecond gap ties differ, absent from real data
    * (parity asserted in CdcStreamSpec). */
  def sessionCounts(stream: DataFrame, tsCol: String, keyCol: String,
                    gap: String, watermarkDelay: String): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col(keyCol),
        unix_micros(col("sw.start")).as("session_start_us"),
        col("n_events"))

  /** Stream-stream interval join — streaming attribution (the streaming
    * form of the batch B15 range join / B10 as-of family): each purchase
    * pairs with every click by the same user in the preceding `window`.
    * BOTH sides carry event-time watermarks and the join condition
    * bounds the event-time distance, so Spark derives a state-eviction
    * watermark per side — buffered state is O(events inside the
    * interval), never the full history. Inner join ⇒ a pair emits as
    * soon as both rows have arrived; eviction follows the watermark, so
    * results match the batch join exactly for data at most `delay` late
    * (parity pinned in CdcStreamSpec). */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
                      delay: String, window: String): DataFrame =
    attributionJoinWith(purchases, clicks, delay, window, "inner")

  /** LEFT-OUTER form of [[attributionJoin]] (A44): every purchase
    * emits — attributed rows as soon as the click arrives, and
    * UNATTRIBUTED purchases as null-click rows once the watermark
    * passes their match horizon (the state-timeout emission Spark
    * derives from the dual watermarks + time-range condition). This is
    * the "conversions that never got a touchpoint" feed a batch LEFT
    * JOIN computes offline, produced incrementally with the same
    * O(interval) state as the inner form. Timeout emission only fires
    * when event time ADVANCES past the tail — a bounded drain must
    * push the watermark with a final sentinel flush (the
    * cdc_stream_interval_join_outer query and CdcStreamSpec show the
    * pattern; a production feed advances naturally). */
  def attributionJoinOuter(purchases: DataFrame, clicks: DataFrame,
                           delay: String, window: String): DataFrame =
    attributionJoinWith(purchases, clicks, delay, window, "left_outer")

  private def attributionJoinWith(purchases: DataFrame, clicks: DataFrame,
                                  delay: String, window: String,
                                  joinType: String): DataFrame = {
    val p = purchases.select(col("user_id"), col("ts").as("p_ts"),
      col("event_id").as("purchase_seq"))
      .withWatermark("p_ts", delay)
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("event_id").as("click_seq"))
      .withWatermark("c_ts", delay)
    p.join(c, col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $window"), joinType)
      .select(col("user_id"), unix_micros(col("p_ts")).as("purchase_ts_us"),
        col("purchase_seq"), unix_micros(col("c_ts")).as("click_ts_us"),
        col("click_seq"))
  }

  /** Replay dedup on a stream — the streaming form of the batch
    * [[graft.cdc.Materialize.dedup]] (A14): drops redelivered events by
    * (key, seq) identity while bounding state with the watermark — an
    * at-least-once upstream (the reference's delivery model,
    * README.md:60-65) becomes exactly-once downstream as long as
    * redeliveries arrive within `watermarkDelay`. State is partitioned
    * by the dedup key across executors and entries expire as the
    * watermark passes — never unbounded. */
  def dedupWithinWatermark(stream: DataFrame, tsCol: String,
                           watermarkDelay: String,
                           idCols: Seq[String] = Seq("key", "seq")): DataFrame =
    stream
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(idCols)

  /** The query's current watermark in epoch-micros — the resolved-ts of
    * this changefeed (reference README.md:64). None until the first
    * batch with event-time data completes. */
  def resolvedTsUs(query: StreamingQuery): Option[Long] =
    Option(query.lastProgress)
      .flatMap(p => Option(p.eventTime.get("watermark")))
      .map(ts => java.time.Instant.parse(ts).toEpochMilli * 1000L)

  /** One changelog row in the canonical events-feed shape (SURVEY.md §3). */
  case class ChangeRow(key: Long, commit_ts_us: Long, seq: Long, op: String,
                       event_type: String, value: Double, props: String)

  /** Continuous snapshot maintenance — the streaming form of
    * `Materialize.snapshot` (A2): per-key state holds the latest-version
    * row; every micro-batch emits the keys it updated (Update mode).
    * State is partitioned by key across executors and is O(|keys|); a
    * late or replayed event older than the stored version is ignored,
    * so the sink converges under at-least-once upstream delivery. */
  def snapshotUpdates(changelog: DataFrame): Dataset[ChangeRow] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = changelog.sparkSession
    import spark.implicits._
    changelog
      .selectExpr("key", "commit_ts_us", "seq", "op", "event_type", "value", "props")
      .as[ChangeRow]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: Long, events: Iterator[ChangeRow], state: GroupState[ChangeRow]) =>
          val latest = (state.getOption.iterator ++ events)
            .maxBy(r => (r.commit_ts_us, r.seq))
          if (state.getOption.forall(s =>
            (latest.commit_ts_us, latest.seq) != (s.commit_ts_us, s.seq))) {
            state.update(latest)
            Iterator.single(latest)
          } else Iterator.empty
      }
  }
}
