package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog → table-state operators.
  *
  * Scale notes (SURVEY.md §5): snapshot uses `max_by(payload, version)` —
  * ONE hash shuffle with map-side partial aggregation, state ~ |keys|.
  * The naive `row_number() over (partition by key order by ts desc)` sorts
  * the full changelog per partition and materializes every version; at
  * 100 TB of change events that is strictly worse. Partial aggregation
  * means each map task collapses its local versions of a key before the
  * shuffle, so shuffled bytes ~ |distinct keys per task|, not |events|.
  */
object Materialize {

  private def version = struct(col("commit_ts_us"), col("seq"))

  /** Latest state per key; delete-tombstoned keys are dropped
    * (reference README.md:63 — EmitRowChangedEvents apply semantics). */
  def snapshot(changelog: DataFrame): DataFrame = {
    val payloadCols = changelog.columns.filterNot(_ == "key")
    changelog
      .groupBy(col("key"))
      .agg(max_by(struct(payloadCols.map(col): _*), version).as("last"))
      .where(col("last.op") =!= ChangeEvent.Delete)
      .select(col("key") +: payloadCols.map(c => col(s"last.$c").as(c)): _*)
  }

  /** Resolved-ts (reference README.md:64 — FlushRowChangedEvents returns a
    * ResolvedTs): the watermark below which every partition of the feed has
    * been fully observed = min over processing partitions of the max
    * committed ts. `numPartitions` models the table-pipeline split.
    */
  def resolvedTs(changelog: DataFrame, numPartitions: Int = 32): DataFrame =
    changelog
      .groupBy(pmod(col("key"), lit(numPartitions.toLong)).as("pipeline"))
      .agg(max(col("commit_ts_us")).as("max_ts_us"))
      .agg(min(col("max_ts_us")).as("resolved_ts_us"))

  /** Feed-health / checkpoint-lag report (the TiCDC "checkpoint lag"
    * operational metric, reference README.md:64-65): per processing
    * pipeline, its event count, max committed ts, the feed-wide
    * resolved-ts, and how far the pipeline's frontier runs AHEAD of the
    * resolved-ts (`lag_us` = max_ts − resolved-ts; the slowest pipeline
    * shows 0 and is the one holding the checkpoint back).
    *
    * Scale shape: ONE map-side-combined aggregation over the changelog
    * down to |pipelines| rows; the resolved-ts scalar joins back as a
    * broadcast of a 1-row aggregate over the CHECKPOINTED per-pipeline
    * frame — the corpus is scanned exactly once. */
  def feedLag(changelog: DataFrame, numPartitions: Int = 32): DataFrame = {
    val per = changelog
      .groupBy(pmod(col("key"), lit(numPartitions.toLong)).as("pipeline"))
      .agg(max(col("commit_ts_us")).as("max_ts_us"),
        count(lit(1)).as("n_events"))
      .localCheckpoint()
    val resolved = per.agg(min(col("max_ts_us")).as("resolved_ts_us"))
    per.crossJoin(broadcast(resolved))
      .select(col("pipeline"), col("n_events"), col("max_ts_us"),
        col("resolved_ts_us"),
        (col("max_ts_us") - col("resolved_ts_us")).as("lag_us"))
      .orderBy("pipeline")
  }

  /** Incremental snapshot maintenance — apply a new changelog slice to
    * an ALREADY-MATERIALIZED state table (the per-flush warehouse MERGE,
    * reference README.md:24,64: batch writes advance resolved-ts to
    * resolved-ts). The state rows re-enter as synthetic events older
    * than every delta event, so one `max_by` pass yields the new state:
    * delta upserts win, delta deletes tombstone, untouched keys carry
    * over.
    *
    * Scale shape: |state| + |delta| rows through ONE partial-agg
    * shuffle — history is never rescanned; equivalent to
    * `snapshot(fullChangelog)` (pinned in spec + oracle) at a fraction
    * of the input. `state` must be a prior [[snapshot]]/[[upsert]]
    * output (payload + commit_ts_us/seq columns). */
  def upsert(state: DataFrame, delta: DataFrame): DataFrame = {
    val asEvents = state.withColumn("op", lit(ChangeEvent.Insert))
    snapshot(asEvents.unionByName(delta.select(asEvents.columns.map(col): _*)))
  }

  /** SCD2-style version history: every non-delete change event becomes
    * a validity interval [valid_from_us, valid_to_us) per key — the
    * temporal-table / "as of any past time" view a warehouse keeps next
    * to the live snapshot. The currently-live version has a null
    * valid_to_us; a delete closes the prior interval without opening a
    * new one.
    *
    * Scale shape: ONE window (lead over the per-key version order) on
    * the same (key)-partitioned shuffle the snapshot uses — state is
    * the changelog itself, no joins, no second pass. */
  def history(changelog: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key"))
      .orderBy(col("commit_ts_us"), col("seq"))
    changelog
      .withColumn("valid_to_us", lead(col("commit_ts_us"), 1).over(w))
      .where(col("op") =!= ChangeEvent.Delete)
      .select(col("key"), col("seq"), col("op"),
        col("commit_ts_us").as("valid_from_us"), col("valid_to_us"))
  }

  /** Net change per key between two resolved-ts points — what a
    * warehouse sink applies per flush (reference README.md:24,64: batch
    * writes advance from one ResolvedTs to the next). For every key with
    * events in (fromTs, toTs]:
    *   - `op` = 'D' if its latest state at toTs is a tombstone,
    *     'I' if the key had no live state at fromTs, else 'U';
    *   - payload = the latest state at toTs.
    * Keys whose net effect is delete-of-nonexistent are dropped.
    * Two bounded-state aggregations (latest ≤ fromTs, latest ≤ toTs)
    * joined on key — no sorts, state ~ |touched keys|. */
  def delta(changelog: DataFrame, fromTsUs: Long, toTsUs: Long): DataFrame = {
    val payloadCols = changelog.columns.filterNot(_ == "key").toSeq
    def latestUpTo(ts: Long) = changelog
      .where(col("commit_ts_us") <= ts)
      .groupBy(col("key"))
      .agg(max_by(struct(payloadCols.map(col): _*), version).as("last"))
    val touched = changelog
      .where(col("commit_ts_us") > fromTsUs && col("commit_ts_us") <= toTsUs)
      .select("key").distinct()
    val before = latestUpTo(fromTsUs)
      .select(col("key"),
        (col("last.op") =!= ChangeEvent.Delete).as("existed_before"))
    val after = latestUpTo(toTsUs)
    touched
      .join(after, "key")
      .join(before, Seq("key"), "left")
      .withColumn("net_op",
        when(col("last.op") === ChangeEvent.Delete, ChangeEvent.Delete)
          .when(coalesce(col("existed_before"), lit(false)), ChangeEvent.Update)
          .otherwise(ChangeEvent.Insert))
      .where(col("net_op") =!= ChangeEvent.Delete ||
        coalesce(col("existed_before"), lit(false)))
      .select(Seq(col("key"), col("net_op")) ++
        payloadCols.filterNot(_ == "op").map(c => col(s"last.$c").as(c)): _*)
  }

  /** Log compaction: below the resolved-ts every key keeps only its
    * latest version (tombstones included — downstream still needs the
    * delete); above it the log is untouched (those events may still be
    * reordered/replayed). One bounded-state aggregation + a union. */
  def compact(changelog: DataFrame, resolvedTsUs: Long): DataFrame = {
    val payloadCols = changelog.columns.filterNot(_ == "key").toSeq
    val compacted = changelog
      .where(col("commit_ts_us") <= resolvedTsUs)
      .groupBy(col("key"))
      .agg(max_by(struct(payloadCols.map(col): _*), version).as("last"))
      .select(col("key") +: payloadCols.map(c => col(s"last.$c").as(c)): _*)
    compacted.unionByName(changelog.where(col("commit_ts_us") > resolvedTsUs))
  }

  /** Exact replay-dedup: at-least-once upstream delivery can duplicate
    * events; keep one row per (key, commit_ts_us, seq). Aggregation (not
    * dropDuplicates-then-sort) so partial agg collapses dupes map-side. */
  def dedup(changelog: DataFrame): DataFrame = {
    val payload = changelog.columns.filterNot(ChangeEvent.metaColumns.contains)
    changelog
      .groupBy(col("key"), col("commit_ts_us"), col("seq"))
      .agg(
        first(col("op")).as("op"),
        payload.map(c => first(col(c)).as(c)): _*)
  }
}
