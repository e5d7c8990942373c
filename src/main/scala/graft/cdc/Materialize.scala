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
