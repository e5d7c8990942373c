package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-change event model.
  *
  * Mirrors the reference's Sink contract (reference README.md:60-70):
  * TiCDC emits ordered row-change events — insert / update / delete with a
  * commit timestamp — plus DDL events and resolved-ts watermarks. Here a
  * changelog is simply a DataFrame with the canonical columns below, so
  * every downstream operator is a declarative Spark plan.
  *
  * Canonical changelog schema:
  *   key          BIGINT   — row key (primary key of the upstream table)
  *   commit_ts_us BIGINT   — commit timestamp, epoch microseconds
  *   seq          BIGINT   — tiebreak within a commit-ts (event id)
  *   op           STRING   — 'I' | 'U' | 'D'
  *   ...payload columns
  */
object ChangeEvent {
  val Insert = "I"
  val Update = "U"
  val Delete = "D"

  val metaColumns: Seq[String] = Seq("key", "commit_ts_us", "seq", "op")
}

object Changelog {

  /** Attach before-images (reference README.md:62 — TiCDC's
    * RowChangedEvent carries before+after row images; update-diff and
    * correction plugins, README.md:88, need the previous row state).
    *
    * The before-image of an event is the previous payload of the same
    * key in commit order: ONE shuffle on `key`, a single window sort
    * shared by every lag() — linear state, no self-join. Insert rows get
    * null (there is no prior image).
    *
    * @param payloadCols columns whose prior values form the before image
    * @return input plus a `before` struct column
    */
  def withBeforeImages(changelog: DataFrame, payloadCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key"))
      .orderBy(col("commit_ts_us"), col("seq"))
    val prior = struct(payloadCols.map(c => col(c).as(c)): _*)
    changelog.withColumn("before",
      when(col("op") =!= ChangeEvent.Insert, lag(prior, 1).over(w)))
  }

  /** Derive a CDC changelog from the synthetic `events` table (SURVEY.md §3):
    * signup→I, error→D (tombstone), click/view/purchase→U; key = user_id;
    * commit order = (ts, event_id). Declared mapping, deterministic, so every
    * CDC operator has a DuckDB oracle.
    */
  def fromEvents(events: DataFrame): DataFrame =
    events.select(
      col("user_id").as("key"),
      col("ts_us").as("commit_ts_us"),
      col("event_id").as("seq"),
      when(col("event_type") === "signup", ChangeEvent.Insert)
        .when(col("event_type") === "error", ChangeEvent.Delete)
        .otherwise(ChangeEvent.Update)
        .as("op"),
      col("event_type"),
      col("value"),
      col("props"))
}
