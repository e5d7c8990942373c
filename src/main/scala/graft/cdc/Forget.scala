package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten propagation over a changelog (A38).
  *
  * A GDPR/CCPA erasure request arrives as a RELATION of subject keys
  * (not a predicate — the request list comes from an external system),
  * and the pipeline must (a) physically drop every change event for
  * those keys — erasure, not a `D` tombstone, which would itself retain
  * the key — and (b) produce an audit row per requested key recording
  * what was purged, whether the key was live in the materialized
  * snapshot at purge time, and a re-derived residual-trace count.
  *
  * Scale shape: the forget list is tiny relative to the feed, so both
  * the audit (semi) and the purge (anti) are BROADCAST joins against
  * the request frame — the changelog itself never shuffles. The audit
  * aggregate is one map-side-combined shuffle of |forget-keys| groups.
  * The residual count is deliberately computed FROM THE PURGED FRAME
  * (not assumed): a purge bug surfaces as a nonzero
  * `n_remaining_traces` and fails the cross-engine hash, making the
  * audit self-verifying.
  */
object Forget {

  private def version = struct(col("commit_ts_us"), col("seq"))

  /** The changelog with every event of `forgetKeys` (column `key`)
    * physically removed — broadcast anti join, no feed shuffle. */
  def purge(changelog: DataFrame, forgetKeys: DataFrame): DataFrame =
    changelog.join(broadcast(forgetKeys.select("key").distinct()),
      Seq("key"), "left_anti")

  /** Per-forgotten-key audit: events purged, ts range, whether the key
    * was visible in the snapshot (latest op not a delete), and the
    * residual-trace count re-derived from the purged frame (0 when the
    * purge is correct — the self-check column). */
  def audit(changelog: DataFrame, forgetKeys: DataFrame): DataFrame = {
    val keys = broadcast(forgetKeys.select("key").distinct())
    val purgedStats = changelog.join(keys, Seq("key"))
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_events_purged"),
        min(col("commit_ts_us")).as("first_ts_us"),
        max(col("commit_ts_us")).as("last_ts_us"),
        when(max_by(col("op"), version) =!= ChangeEvent.Delete, 1L)
          .otherwise(0L).as("in_snapshot"))
    val residual = purge(changelog, forgetKeys)
      .join(keys, Seq("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n_rem"))
    purgedStats.join(residual, Seq("key"), "left")
      .select(col("key").as("user_id"), col("n_events_purged"),
        col("first_ts_us"), col("last_ts_us"), col("in_snapshot"),
        coalesce(col("n_rem"), lit(0L)).as("n_remaining_traces"))
  }
}
