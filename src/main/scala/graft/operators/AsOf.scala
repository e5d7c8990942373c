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

  /** Nearest-event as-of join (pandas `merge_asof direction='nearest'`):
    * for each left row, attach the right row with the same key whose ts is
    * CLOSEST in either direction — the backward match when distances tie.
    *
    * Same union+one-shuffle plan as [[joinPrior]], with a second window
    * frame scanning forward: `last(ignoreNulls)` over the preceding frame
    * yields the backward candidate, `first(ignoreNulls)` over
    * `rowsBetween(1, unboundedFollowing)` the forward one; a scan-local
    * CASE picks the closer. Still linear per key — the naive form is a
    * theta join on |ts delta| with a per-left argmin, quadratic per key.
    *
    * Output adds `matched_ts` (ts of the chosen right row, null when the
    * key has no right rows) and `direction` ('prev'/'next'/null).
    */
  def joinNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      seq: String,
      rightPayload: Map[String, String]): DataFrame = {

    val l = left.withColumn("__is_left", lit(1))
    val r = right.select(
      Seq(col(key), col(ts), col(seq), lit(0).as("__is_left"),
        col(ts).as("__rts")) ++
        rightPayload.map { case (c, a) => col(c).as(a) }: _*)
    val unified = l.unionByName(r, allowMissingColumns = true)

    val wPrev = Window.partitionBy(col(key)).orderBy(col(ts), col(seq))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(col(key)).orderBy(col(ts), col(seq))
      .rowsBetween(1, Window.unboundedFollowing)

    val names = rightPayload.values.toSeq :+ "__rts"
    val twoSided = names.foldLeft(unified) { (df, a) =>
      df.withColumn(s"__p_$a", last(col(a), ignoreNulls = true).over(wPrev))
        .withColumn(s"__n_$a", first(col(a), ignoreNulls = true).over(wNext))
    }

    val pTs = col("__p___rts")
    val nTs = col("__n___rts")
    val usePrev = pTs.isNotNull &&
      (nTs.isNull || (col(ts) - pTs) <= (nTs - col(ts)))
    val useNext = nTs.isNotNull &&
      (pTs.isNull || (nTs - col(ts)) < (col(ts) - pTs))

    val chosen = names.foldLeft(twoSided) { (df, a) =>
      df.withColumn(a,
        when(usePrev, col(s"__p_$a")).when(useNext, col(s"__n_$a")))
    }
    chosen.where(col("__is_left") === 1)
      .withColumn("matched_ts", col("__rts"))
      .withColumn("direction",
        when(usePrev, lit("prev")).when(useNext, lit("next")))
      .drop(Seq("__is_left", "__rts") ++
        names.flatMap(a => Seq(s"__p_$a", s"__n_$a")): _*)
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
