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

  /** Per-session rollup. */
  def stats(events: DataFrame, key: String, tsUs: String, seq: String,
            gapUs: Long, valueCol: String): DataFrame =
    assign(events, key, tsUs, seq, gapUs)
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsUs)).as("session_start_us"),
        max(col(tsUs)).as("session_end_us"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("decimal(38,4)")
          .as("sum_value"))
}
