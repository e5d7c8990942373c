package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join — the scale-correct form of
  * "left row matches right rows with ts in (left.ts - window, left.ts]".
  *
  * The naive formulation is a theta join (`l.ts - w < r.ts AND r.ts <=
  * l.ts`), which Spark can only execute as a nested-loop product — n²
  * at 100 TB. Here both sides are mapped to time buckets of width
  * `windowUs`: a right row lands in its own bucket, a left row explodes
  * to the two buckets its window can overlap (its own + the previous).
  * The join is then a plain EQUI-join on (key, bucket) — shuffle
  * partitioned, AQE-skew-splittable — followed by the exact range
  * filter. Every qualifying pair meets exactly once (a right row's
  * bucket is unique), so no dedup pass is needed.
  */
object RangeJoin {

  /** For each left row, count right rows of the same key with
    * `right.ts in (left.ts - windowUs, left.ts]`, right rows at the
    * exact same (ts) with seq >= left's excluded (strictly-prior calls
    * use seq ordering as tiebreak, mirroring [[AsOf]]).
    *
    * Output: left rows + `n_matches`.
    */
  def countPriorWithin(left: DataFrame, right: DataFrame, key: String,
                       tsUs: String, seq: String, windowUs: Long): DataFrame = {
    val l = left.select(col(key).as("__k"), col(tsUs).as("__lts"),
      col(seq).as("__lseq"))
      .withColumn("__bucket", explode(array(
        floor(col("__lts") / windowUs), floor(col("__lts") / windowUs) - 1)))
    val r = right.select(col(key).as("__k"), col(tsUs).as("__rts"),
      col(seq).as("__rseq"))
      .withColumn("__bucket", floor(col("__rts") / windowUs))
    val matched = l.join(r, Seq("__k", "__bucket"))
      .where(col("__rts") > col("__lts") - windowUs &&
        (col("__rts") < col("__lts") ||
          (col("__rts") === col("__lts") && col("__rseq") < col("__lseq"))))
      .groupBy(col("__k"), col("__lts"), col("__lseq"))
      .agg(count(lit(1)).as("n_matches"))
    left.join(matched,
        left(key) === matched("__k") && left(tsUs) === matched("__lts")
          && left(seq) === matched("__lseq"), "left")
      .drop("__k", "__lts", "__lseq")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
  }

  /** Interval-OVERLAP join — pair every left interval [lStart, lEnd]
    * with every right interval [rStart, rEnd] it overlaps (closed
    * endpoints: overlap ⟺ lStart ≤ rEnd ∧ rStart ≤ lEnd). The theta
    * form is a nested-loop product; here each interval explodes to the
    * time buckets it spans and the join is a plain equi-join on the
    * bucket — shuffle-partitioned, AQE-splittable.
    *
    * An overlapping pair shares EVERY bucket their intersection spans,
    * so a naive bucket join duplicates it; instead of a dedup shuffle
    * the join keeps a pair only in its CANONICAL bucket — the bucket of
    * max(lStart, rStart), the first bucket of the intersection — which
    * each pair has exactly one of (the meet-exactly-once trick from the
    * MapReduce interval-join literature; all math is exact integer
    * `div`, so the canonical test is engine-portable). Cost: each
    * interval carries span/bucketUs + 1 copies — pick `bucketUs` near
    * the typical interval length so the explode factor stays O(1);
    * pathological long intervals fan out linearly, never quadratically.
    *
    * Caller contract: the two frames' column names must not collide
    * (prefix them); both bounds are epoch-µs longs. */
  def overlapPairs(left: DataFrame, lStart: String, lEnd: String,
                   right: DataFrame, rStart: String, rEnd: String,
                   bucketUs: Long): DataFrame = {
    def bucketed(df: DataFrame, s: String, e: String, as: String) =
      df.withColumn(as, explode(sequence(
        expr(s"$s div $bucketUs"), expr(s"$e div $bucketUs"))))
    val l = bucketed(left, lStart, lEnd, "__lb")
    val r = bucketed(right, rStart, rEnd, "__rb")
    l.join(r, col("__lb") === col("__rb")
        && col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd)
        && col("__lb") ===
          expr(s"greatest($lStart, $rStart) div $bucketUs"))
      .drop("__lb", "__rb")
  }
}
