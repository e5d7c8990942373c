package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.MinHash

/** Sink-consistency checking — the "did the replica converge to the
  * source?" tool every CDC deployment runs after a feed catches up
  * (TiCDC's sync-diff-inspector, Debezium's incremental-snapshot
  * verification). Both sides compute the same bucketed, ORDER-
  * INDEPENDENT checksum; equal buckets prove row-set equality without
  * moving either table, and a mismatch localizes to 1/buckets of the
  * keyspace for targeted re-sync.
  *
  * Scale shape: one scan + one partial-agg shuffle down to `buckets`
  * rows per side. The row digest is the engine-portable md5-prefix
  * hash of a '|'-joined canonical string; the bucket sum runs in
  * decimal(38,0) (≈1e12 rows × 2^32 ≈ 4e21 overflows int64 — the same
  * silent-wrap trap as money sums) and only the final mod-1e18 value
  * must fit a long.
  *
  * Caller contract: `rowRepr` columns must render identically as
  * strings in every engine — integers/longs/strings only; canonicalize
  * doubles to fixed-point (e.g. cents) and timestamps to epoch-µs
  * BEFORE passing them in. */
object Consistency {

  private val Mod = 1000000000000000000L // 10^18

  /** Bucketed order-independent checksum: (bucket, n_rows, checksum),
    * `buckets` rows total. */
  def checksum(df: DataFrame, bucketKey: Column, rowRepr: Seq[Column],
               buckets: Int): DataFrame = {
    require(buckets >= 1, "buckets must be >= 1")
    val repr = concat_ws("|",
      rowRepr.map(c => coalesce(c.cast("string"), lit("<null>"))): _*)
    df.groupBy(
        pmod(MinHash.hash32(bucketKey.cast("string")), lit(buckets.toLong))
          .as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(MinHash.hash32(repr).cast("decimal(38,0)")),
          lit(Mod).cast("decimal(38,0)")).cast("long").as("checksum"))
  }

  /** DuckDB mirror: same digest, same bucket rule, same modulus.
    * `reprExprs` are SQL fragments already canonicalized per the caller
    * contract. */
  def checksumSql(from: String, bucketKeyExpr: String,
                  reprExprs: Seq[String], buckets: Int): String = {
    val repr = reprExprs
      .map(e => s"coalesce(CAST($e AS VARCHAR), '<null>')")
      .mkString("concat_ws('|', ", ", ", ")")
    s"""SELECT
       |  (('0x' || substr(md5(CAST($bucketKeyExpr AS VARCHAR)), 1, 8))::BIGINT
       |     % $buckets) AS bucket,
       |  count(*) AS n_rows,
       |  CAST(sum(('0x' || substr(md5($repr), 1, 8))::BIGINT) % $Mod
       |    AS BIGINT) AS checksum
       |FROM $from GROUP BY 1""".stripMargin
  }
}
