package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: a new session starts when the gap since the
  * previous event of the same key exceeds `gapUs`.
  *
  * Classic lag → boundary-flag → running-sum assignment: two window passes
  * over the SAME (key, ordered) partitioning, so Spark shuffles once and
  * reuses the sort. Per-key state is a single pass — linear at any scale;
  * skewed keys are bounded by per-user event counts, not table size.
  */
object Sessionize {

  /** @return input plus a `session_id` column (1-based, per key). */
  def assign(events: DataFrame, key: String, tsUs: String, seq: String,
             gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(tsUs), col(seq))
    val boundary = when(
      col(tsUs) - lag(col(tsUs), 1).over(w) > gapUs ||
        lag(col(tsUs), 1).over(w).isNull, 1).otherwise(0)
    events
      .withColumn("__new_session", boundary)
      .withColumn("session_id",
        sum(col("__new_session")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new_session")
  }

  /** Value quantized to cents as a DECIMAL(38,0): summed in decimal (no
    * silent int64 wrap at scale), with the final per-group aggregate cast
    * to LONG — exact, order-independent, and hash-stable cross-engine
    * (DecimalType outputs render trailing zeros — SURVEY.md §6). */
  private def cents(valueCol: String) =
    (col(valueCol).cast("decimal(18,2)") * 100).cast("decimal(38,0)")

  /** Per-session rollup. */
  def stats(events: DataFrame, key: String, tsUs: String, seq: String,
            gapUs: Long, valueCol: String): DataFrame =
    assign(events, key, tsUs, seq, gapUs)
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsUs)).as("session_start_us"),
        max(col(tsUs)).as("session_end_us"),
        sum(cents(valueCol)).cast("long").as("sum_value_e2"))

  /** Skew-resistant two-phase variant of [[stats]], same output.
    *
    * [[stats]] windows over (key) — a pathological hot key (one user
    * with 10^8 events at 100 TB) sorts in a single task. Here:
    *  - phase 1 windows over (key, time-bucket): the hot key's events
    *    split across |buckets| tasks; local sessions are aggregated to
    *    ONE summary row each (gap rule already correct inside a bucket);
    *  - phase 2 merges adjacent local sessions whose boundary gap is
    *    <= gapUs with a window over the per-key SUMMARIES — rows ~
    *    |sessions|, orders of magnitude smaller than |events| — then
    *    sums the partial aggregates per merged chain.
    * Identical result to [[stats]] for any bucket size (spec-pinned):
    * bucketing splits time, local sessionization respects the gap rule
    * within buckets, and the merge re-joins exactly the sessions a
    * global pass would not have split. */
  def statsSkewAware(events: DataFrame, key: String, tsUs: String, seq: String,
                     gapUs: Long, valueCol: String, bucketUs: Long): DataFrame = {
    val bucketed = events.withColumn("__bucket", floor(col(tsUs) / bucketUs))
    val wLocal = Window.partitionBy(col(key), col("__bucket"))
      .orderBy(col(tsUs), col(seq))
    val boundary = when(
      col(tsUs) - lag(col(tsUs), 1).over(wLocal) > gapUs ||
        lag(col(tsUs), 1).over(wLocal).isNull, 1).otherwise(0)
    val locals = bucketed
      .withColumn("__new", boundary)
      .withColumn("__ls",
        sum(col("__new")).over(wLocal.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(key), col("__bucket"), col("__ls"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsUs)).as("session_start_us"),
        max(col(tsUs)).as("session_end_us"),
        sum(cents(valueCol)).as("sum_cents"))
    val wKey = Window.partitionBy(col(key))
      .orderBy(col("session_start_us"), col("session_end_us"))
    val chained = locals
      .withColumn("__newChain", when(
        col("session_start_us") - lag(col("session_end_us"), 1).over(wKey) > gapUs ||
          lag(col("session_end_us"), 1).over(wKey).isNull, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("__newChain")).over(wKey.rowsBetween(Window.unboundedPreceding, 0)))
    chained
      .groupBy(col(key), col("session_id"))
      .agg(
        sum(col("n_events")).as("n_events"),
        min(col("session_start_us")).as("session_start_us"),
        max(col("session_end_us")).as("session_end_us"),
        sum(col("sum_cents")).cast("long").as("sum_value_e2"))
  }
}
