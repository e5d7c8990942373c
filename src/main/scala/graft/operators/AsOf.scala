package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the most recent
  * right row with the same key and ts <= left ts.
  *
  * Spark-first plan (SURVEY.md §5): tag both sides, UNION, one shuffle on
  * `key`, then `last(_, ignoreNulls).over(orderBy(ts, seq))` — linear in
  * |left|+|right| per key. The naive `left JOIN right ON ts >= ts` +
  * max-per-group is quadratic per key and shuffles the cross product; at
  * 100 TB the union+window form is the only one that survives.
  *
  * Tie semantics: rows are ordered by (ts, seq); a right row at the exact
  * same ts counts as "prior" iff its seq is smaller. `seq` must be unique
  * per row (event id), which also makes the result deterministic.
  */
object AsOf {

  /** @param left  rows to enrich; must have `key`, `ts`, `seq` columns
    * @param right rows to look up; must have `key`, `ts`, `seq` columns
    * @param rightPayload right columns to carry (renamed as given)
    */
  def joinPrior(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      seq: String,
      rightPayload: Map[String, String]): DataFrame = {

    val l = left.withColumn("__is_left", lit(1))
    val r = right.select(
      Seq(col(key), col(ts), col(seq), lit(0).as("__is_left")) ++
        rightPayload.map { case (c, a) => col(c).as(a) }: _*)
    // union by name; each side's missing columns become null on the other
    val unified = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(seq))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = rightPayload.values.foldLeft(unified) { (df, a) =>
      df.withColumn(a, last(col(a), ignoreNulls = true).over(w))
    }
    filled.where(col("__is_left") === 1).drop("__is_left")
  }

  /** [[joinPrior]] with a staleness bound (pandas `merge_asof`
    * `tolerance`): the matched right row only attaches when its ts is
    * within `toleranceUs` of the left ts; staler matches null out, and
    * `matched_ts` carries the matched right ts (null when no match in
    * range). Same union+window plan — the bound is a scan-local
    * post-filter, so the 100 TB shape is unchanged. */
  def joinPriorWithin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      seq: String,
      rightPayload: Map[String, String],
      toleranceUs: Long): DataFrame = {

    val l = left.withColumn("__is_left", lit(1))
    val r = right.select(
      Seq(col(key), col(ts), col(seq), lit(0).as("__is_left"),
        col(ts).as("__rts")) ++
        rightPayload.map { case (c, a) => col(c).as(a) }: _*)
    val unified = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(seq))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = (rightPayload.values.toSeq :+ "__rts").foldLeft(unified) {
      (df, a) => df.withColumn(a, last(col(a), ignoreNulls = true).over(w))
    }
    val inRange = col("__rts").isNotNull &&
      col(ts) - col("__rts") <= toleranceUs
    val gated = rightPayload.values.foldLeft(filled) { (df, a) =>
      df.withColumn(a, when(inRange, col(a)))
    }
    gated.where(col("__is_left") === 1)
      .withColumn("matched_ts", when(inRange, col("__rts")))
      .drop("__is_left", "__rts")
  }
}
