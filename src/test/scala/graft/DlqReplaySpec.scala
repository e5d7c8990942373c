package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.{DlqReplay, Envelope}

/** Quarantine replay contracts (A62): after a repair, the DLQ drains
  * back through the MAIN-PATH classifier and converges with the clean
  * feed — recovered rows are byte-identical to never-poisoned ones,
  * a re-run replays nothing (ledger idempotence), and what the repair
  * could not fix stays quarantined carrying BOTH reasons and the
  * ORIGINAL envelope for the next repair iteration. */
class DlqReplaySpec extends SparkSpec {

  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def log = Seq(
    (1L, 1000L, 1L, "I", "signup", 1.5, """{"a":1}"""),
    (1L, 2000L, 2L, "U", "click", 0.25, "p"),
    (2L, 1500L, 3L, "U", "view", 1e-7, null),
    (2L, 3000L, 4L, "D", "error", -2.0, "q"),
    (3L, 3500L, 5L, "U", "click", 7.0, "r"),
    (3L, 4000L, 6L, "U", "view", 8.0, "s")
  ).toDF("key", "commit_ts_us", "seq", "op", "event_type", "value", "props")

  private val canon = Seq("key", "commit_ts_us", "seq", "op",
    "event_type", "value", "props")

  /** Wire with seq 2,4 table-typo'd and seq 5 type-junked (repairable),
    * seq 6 truncated (NOT repairable). */
  private def poisonedWire = {
    val e = col(Envelope.EnvelopeCol)
    Envelope.encode(log, "db", "t", Seq("event_type", "value", "props"))
      .select(
        when(col("seq").isin(2L, 4L),
          regexp_replace(e, "\"table\":\"t\"", "\"table\":\"zz\""))
          .when(col("seq") === 5L,
            regexp_replace(e, "\"type\":\"", "\"type\":\"x"))
          .when(col("seq") === 6L,
            expr(s"substring(${Envelope.EnvelopeCol}, 1, " +
              s"length(${Envelope.EnvelopeCol}) - 5)"))
          .otherwise(e).as(Envelope.EnvelopeCol))
  }

  private val repair: Column => Column = env =>
    regexp_replace(regexp_replace(env,
      "\"table\":\"zz\"", "\"table\":\"t\""),
      "\"type\":\"x", "\"type\":\"")

  test("replay converges: clean-path ∪ recovered ≡ the never-poisoned " +
    "feed minus the unrepairable row; recovered rows are byte-exact") {
    val dec = Envelope.decodeAll(poisonedWire, payload, "db", "t")
    val delivered = dec.where(col("__envelope_error").isNull)
      .drop(Envelope.EnvelopeCol, "__envelope_error")
    val dlq = dec.where(col("__envelope_error").isNotNull)
      .select(col(Envelope.EnvelopeCol), col("__envelope_error"))
    assert(dlq.count() === 4) // 2,4 wrong_table; 5 unknown_type; 6 malformed
    val out = DlqReplay.replay(dlq, repair, payload, "db", "t",
      delivered = Some(delivered))
    assert(out.recovered.select("seq").as[Long].collect().sorted ===
      Array(2L, 4L, 5L))
    val union = delivered.unionAll(out.recovered)
    assert(union.select(canon.map(col): _*).orderBy("seq")
      .collect().toSeq ===
      log.where(col("seq") =!= 6L).select(canon.map(col): _*)
        .orderBy("seq").collect().toSeq)
  }

  test("idempotence: replaying the same DLQ against the post-replay " +
    "ledger recovers nothing (a crashed replay job can just re-run)") {
    val dec = Envelope.decodeAll(poisonedWire, payload, "db", "t")
    val delivered = dec.where(col("__envelope_error").isNull)
      .drop(Envelope.EnvelopeCol, "__envelope_error")
    val dlq = dec.where(col("__envelope_error").isNotNull)
      .select(col(Envelope.EnvelopeCol), col("__envelope_error"))
    val first = DlqReplay.replay(dlq, repair, payload, "db", "t",
      delivered = Some(delivered))
    val ledger = delivered.unionAll(first.recovered)
    val second = DlqReplay.replay(dlq, repair, payload, "db", "t",
      delivered = Some(ledger))
    assert(second.recovered.isEmpty)
  }

  test("residual keeps the ORIGINAL envelope and carries both reasons " +
    "— a second repair iteration has everything it needs") {
    val dec = Envelope.decodeAll(poisonedWire, payload, "db", "t")
    val dlq = dec.where(col("__envelope_error").isNotNull)
      .select(col(Envelope.EnvelopeCol), col("__envelope_error"))
    val out = DlqReplay.replay(dlq, repair, payload, "db", "t")
    val res = out.residual.collect()
    assert(res.length === 1) // only the truncated seq-6 envelope
    val row = res.head
    assert(row.getAs[String]("__dlq_first_reason") === "malformed_json")
    assert(row.getAs[String]("__dlq_replay_reason") === "malformed_json")
    // the residual envelope is the PRE-repair original from the DLQ
    val origs = dlq.select(Envelope.EnvelopeCol).as[String].collect().toSet
    assert(origs.contains(row.getAs[String](Envelope.EnvelopeCol)))
    // and a second iteration with a better repair can consume it:
    // "repair" the truncation by re-encoding seq 6 from source is out
    // of scope — instead verify the residual re-enters replay cleanly
    val again = DlqReplay.replay(
      out.residual.select(col(Envelope.EnvelopeCol),
        col("__dlq_replay_reason").as("__envelope_error")),
      identity[Column], payload, "db", "t")
    assert(again.recovered.isEmpty)
    assert(again.residual.count() === 1)
  }

  test("no ledger = recover everything repairable (bootstrap replay)") {
    val dec = Envelope.decodeAll(poisonedWire, payload, "db", "t")
    val dlq = dec.where(col("__envelope_error").isNotNull)
      .select(col(Envelope.EnvelopeCol), col("__envelope_error"))
    val out = DlqReplay.replay(dlq, repair, payload, "db", "t")
    assert(out.recovered.count() === 3)
  }
}
