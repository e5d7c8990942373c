package graft

import org.apache.spark.sql.functions._

import graft.cdc.Forget

/** A38 erasure contracts: purge leaves zero trace of requested keys and
  * nothing else; the audit's self-check column really re-derives from
  * the purged frame. */
class ForgetSpec extends SparkSpec {

  // (key, commit_ts_us, seq, op) — user 1 live, user 2 deleted last,
  // user 3 untouched by the request
  private lazy val log = {
    import spark.implicits._
    Seq(
      (1L, 100L, 1L, "I"), (1L, 200L, 2L, "U"),
      (2L, 110L, 3L, "I"), (2L, 210L, 4L, "D"),
      (3L, 120L, 5L, "I"))
      .toDF("key", "commit_ts_us", "seq", "op")
  }

  private lazy val req = {
    import spark.implicits._
    Seq(1L, 2L, 9L).toDF("key") // 9 never occurred in the feed
  }

  test("purge removes every requested key's event and nothing else") {
    val purged = Forget.purge(log, req)
    assert(purged.where(col("key").isin(1L, 2L)).count() === 0)
    assert(purged.count() === 1)
    assert(purged.select("key").head().getLong(0) === 3L)
  }

  test("audit rows: counts, ts range, snapshot visibility, zero residual") {
    val rows = Forget.audit(log, req).orderBy("user_id").collect()
    // key 9 never occurred → no audit row (nothing was purged for it)
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val byKey = rows.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(byKey(1L) === ((2L, 100L, 200L, 1L, 0L))) // live in snapshot
    assert(byKey(2L) === ((2L, 110L, 210L, 0L, 0L))) // tombstoned
  }

  test("requesting every key empties the feed; audit accounts for all rows") {
    val all = log.select("key").distinct()
    assert(Forget.purge(log, all).count() === 0)
    val audit = Forget.audit(log, all)
    assert(audit.agg(sum("n_events_purged")).head().getLong(0) === log.count())
    assert(audit.where(col("n_remaining_traces") =!= 0L).count() === 0)
  }
}
