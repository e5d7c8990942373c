package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.cdc.{ChangeEvent, Changelog, Envelope}

/** Wire-format envelope codec contracts (A50): canal-json shape,
  * bit-exact round trip, and the malformed-envelope DLQ split — a
  * poisoned topic must drain into a classified quarantine, never kill
  * the consumer or silently pass damaged rows. */
class EnvelopeSpec extends SparkSpec {

  import spark.implicits._

  private val payload = StructType(Seq(
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def log = Seq(
    (1L, 1000L, 1L, "I", "signup", 1.5, """{"a":1}"""),
    (1L, 2000L, 2L, "U", "click", 0.1, "pipe|and\nnewline \"quoted\""),
    (2L, 1500L, 3L, "U", "view", 1e-7, "unicode \u00e9\u4e2d\u0639"),
    (2L, 3000L, 4L, "D", "error", -0.0, null)
  ).toDF("key", "commit_ts_us", "seq", "op", "event_type", "value", "props")

  test("encode → decode is the identity, doubles and strings bit-exact") {
    val wire = Envelope.encode(log, "db", "t",
      Seq("event_type", "value", "props"))
    // broker metadata columns survive for routing/ordering
    assert(wire.columns.toSet ===
      Set("key", "commit_ts_us", "seq", "op", Envelope.EnvelopeCol))
    val back = Envelope.decode(wire.select(Envelope.EnvelopeCol),
      payload, "db", "t")
    val cols = Seq("key", "commit_ts_us", "seq", "op",
      "event_type", "value", "props")
    assert(back.select(cols.map(col): _*).orderBy("seq").collect().toSeq ===
      log.select(cols.map(col): _*).orderBy("seq").collect().toSeq)
  }

  test("envelope is canal-json-shaped") {
    val env = Envelope.encode(log, "db", "t",
        Seq("event_type", "value", "props"))
      .where(col("seq") === 1).select(Envelope.EnvelopeCol)
      .head.getString(0)
    for (k <- Seq("\"database\":\"db\"", "\"table\":\"t\"",
        "\"pkNames\":[\"key\"]", "\"isDdl\":false", "\"type\":\"INSERT\"",
        "\"data\":[{", "\"_graft\":{"))
      assert(env.contains(k), s"envelope missing $k:\n$env")
    // es is millisecond-floored commit ts (canal's unit)
    assert(env.contains("\"es\":1"))
    // delete carries the deleted image in data (canal's convention)
    val del = Envelope.encode(log, "db", "t",
        Seq("event_type", "value", "props"))
      .where(col("seq") === 4).select(Envelope.EnvelopeCol).head.getString(0)
    assert(del.contains("\"type\":\"DELETE\"") && del.contains("\"data\":[{"))
  }

  test("before-image rides in old when the feed carries one") {
    val withBefore = Changelog.withBeforeImages(
      log.orderBy("seq"), Seq("event_type", "value", "props"))
    val env = Envelope.encode(withBefore, "db", "t",
        Seq("event_type", "value", "props"), beforeCol = Some("before"))
      .where(col("seq") === 2).select(Envelope.EnvelopeCol).head.getString(0)
    assert(env.contains("\"old\":[{"), s"update lacks before-image:\n$env")
    assert(env.contains("\"signup\""), s"old should carry the prior image:\n$env")
    // inserts have no prior image → old omitted entirely
    val ins = Envelope.encode(withBefore, "db", "t",
        Seq("event_type", "value", "props"), beforeCol = Some("before"))
      .where(col("seq") === 1).select(Envelope.EnvelopeCol).head.getString(0)
    assert(!ins.contains("\"old\""))
  }

  test("DDL events cross the wire: sql for humans, _graft_ddl for replay") {
    val ddls = Seq(
      ("add", "c_new", "dflt", 5000L),
      ("drop", "c_old", null, 6000L),
      ("rename", "c_a", "c_b", 7000L))
    val wire = graft.cdc.Envelope.encodeDdl(spark, ddls, "db", "t")
    val env = wire.orderBy("commit_ts_us")
      .select(graft.cdc.Envelope.EnvelopeCol).as[String].collect()
    assert(env(0).contains("\"isDdl\":true"))
    assert(env(0).contains("ADD COLUMN c_new VARCHAR DEFAULT 'dflt'"))
    assert(env(2).contains("RENAME COLUMN c_a TO c_b"))
    // replay side: fields come back exactly, ready for SchemaEvolution
    val back = graft.cdc.Envelope.ddlEvents(wire)
      .orderBy("ts_us")
      .select("kind", "a", "b", "ts_us")
      .as[(String, String, String, Long)].collect().toSeq
    assert(back === ddls.map { case (k, a, b, ts) => (k, a, b, ts) })
    // the DDL extractor ignores row envelopes; the row decoder
    // quarantines DDL envelopes (pinned below) — a mixed topic splits
    val rowWire = graft.cdc.Envelope.encode(log, "db", "t",
      Seq("event_type", "value", "props")).select(graft.cdc.Envelope.EnvelopeCol)
    val mixed = rowWire.unionAll(wire.select(graft.cdc.Envelope.EnvelopeCol))
    assert(graft.cdc.Envelope.ddlEvents(mixed).count() === 3L)
    val split = graft.cdc.Envelope.decodeAll(mixed, payload, "db", "t")
    assert(split.where(col("__envelope_error").isNull).count() === log.count())
    assert(split.where(col("__envelope_error") === "ddl_event_in_row_topic")
      .count() === 3L)
  }

  test("decode parses each envelope exactly ONCE (optimizer barrier)") {
    // Without the OptimizerBarrier, predicate pushdown + project
    // collapse inline the parse alias into every consumer: ~15-25
    // from_json copies per row, measured 10-25× slower at sf0.1. The
    // barrier pins exactly one parse in its own projection.
    // parquet-backed input (a local Seq constant-folds the whole plan)
    val events = Changelog.fromEvents(Tables.events(spark, sfDir))
    val wire = Envelope.encode(events, "db", "t",
      Seq("event_type", "value", "props")).select(Envelope.EnvelopeCol)
    val decoded = Envelope.decode(wire, payload, "db", "t")
      .where(col("op") =!= "D") // a pushable consumer-side filter
    val optimized = decoded.queryExecution.optimizedPlan.toString
    val nParses = "from_json".r.findAllIn(optimized).length
    assert(nParses === 1, s"expected exactly 1 from_json, got $nParses:\n" +
      optimized.take(2000))
  }

  test("malformed envelopes quarantine with classified reasons") {
    val envs = Envelope.encode(log, "db", "t",
        Seq("event_type", "value", "props"))
      .orderBy("seq").select(Envelope.EnvelopeCol).as[String].collect()
    val good = envs(0)
    val ddl = good.replace("\"isDdl\":false", "\"isDdl\":true")
    val badType = good.replace("\"type\":\"INSERT\"", "\"type\":\"TRUNCATE\"")
    val wrongTable = good.replace("\"table\":\"t\"", "\"table\":\"other\"")
    // ABSENT table field must also be wrong_table — =!= would yield
    // null and let the envelope decode clean (ADVICE r13 null-safety)
    val noTable = good.replace("\"table\":\"t\",", "")
    assert(noTable !== good, "noTable surgery must change the envelope")
    val noGraft = good.replaceAll(",\"_graft\":\\{[^}]*\\}", "")
    // the DELETE row's payload has no nested braces (null props), so a
    // flat regex can hollow out its data array
    val noData = envs(3).replaceAll("\"data\":\\[\\{[^}]*\\}\\]", "\"data\":[]")
    assert(noData !== envs(3), "noData surgery must change the envelope")
    assert(noGraft !== good, "noGraft surgery must change the envelope")
    val cases = Seq(
      ("not json at all", "malformed_json"),
      (good.dropRight(5), "malformed_json"),
      ("[1,2,3]", "malformed_json"), // valid JSON, not a row envelope
      (noGraft, "missing_graft_meta"),
      (ddl, "ddl_event_in_row_topic"),
      (badType, "unknown_type"),
      (wrongTable, "wrong_table"),
      (noTable, "wrong_table"),
      (noData, "missing_data"),
      (null.asInstanceOf[String], "null_envelope"))
    val wire = cases.map(_._1).toDF(Envelope.EnvelopeCol)
    val q = Envelope.quarantine(wire, payload, "db", "t")
      .as[(String, String)].collect().toMap
    for ((env, reason) <- cases)
      assert(q.get(env) === Some(reason), s"expected $reason for: $env")
    // the clean row sails through; decode sees ONLY clean rows
    val mixed = (good +: cases.map(_._1)).toDF(Envelope.EnvelopeCol)
    val clean = Envelope.decode(mixed, payload, "db", "t")
    assert(clean.count() === 1L)
    assert(Envelope.quarantine(mixed, payload, "db", "t").count()
      === cases.size.toLong)
    assert(Envelope.decodeAll(mixed, payload, "db", "t").count()
      === (cases.size + 1).toLong)
  }
}
