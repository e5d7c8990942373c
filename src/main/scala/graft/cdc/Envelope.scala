package graft.cdc

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka wire-format envelope for the Topic sink (reference
  * README.md:17, 34 — the RFC's default sink is a Kafka topic carrying
  * a wire protocol external consumers parse; TiCDC ships canal-json /
  * open-protocol codecs for exactly this reason).
  *
  * The envelope here is canal-json-SHAPED (the public Alibaba Canal
  * JSON message format, which TiCDC adopted as its `canal-json`
  * protocol): one JSON object per row change with `id` / `database` /
  * `table` / `pkNames` / `isDdl` / `type` (INSERT|UPDATE|DELETE) /
  * `es` (commit ts, ms) / `ts` / `data` (after-image) / `old`
  * (before-image). Two documented divergences, both in canal-json's own
  * extension spirit (TiCDC adds a `_tidb` section for its extra fields):
  *
  *  - `data`/`old` values keep their JSON-native types (canal stringifies
  *    everything; typed values round-trip doubles bit-exactly, which the
  *    cross-engine oracle requires);
  *  - a `_graft` section carries `{key, commitTsUs, seq}` exactly —
  *    `es` is millisecond-floored like canal's, so microsecond commit
  *    order would not survive the wire without it.
  *
  * Spark-first: encode is ONE `to_json(struct(...))` projection and
  * decode is ONE `from_json` + field re-typing — both codegen'd
  * expressions inside the scan stage, no UDFs, so a 100 TB topic
  * encodes/parses at parquet-scan throughput and the whole
  * produce → broker → consume loop stays a single Catalyst plan on
  * each side of the wire.
  *
  * Malformed envelopes NEVER throw: [[decodeAll]] classifies each
  * record (`__envelope_error` null = clean) so consumers split clean
  * rows from a dead-letter quarantine relationally — the same
  * FAILFAST→DLQ discipline as [[PipedTransform]].
  */
object Envelope {

  val EnvelopeCol = "envelope"

  /** Canal op names for the canonical changelog ops. */
  private val opToType: Column => Column = op =>
    when(op === ChangeEvent.Insert, "INSERT")
      .when(op === ChangeEvent.Update, "UPDATE")
      .when(op === ChangeEvent.Delete, "DELETE")

  private val typeToOp: Column => Column = t =>
    when(t === "INSERT", ChangeEvent.Insert)
      .when(t === "UPDATE", ChangeEvent.Update)
      .when(t === "DELETE", ChangeEvent.Delete)

  /** The declared wire schema (never inferred — the GraftSource
    * discipline): canal-json envelope fields around a typed payload. */
  def wireSchema(payload: StructType): StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("pkNames", ArrayType(StringType)),
    StructField("isDdl", BooleanType),
    StructField("type", StringType),
    StructField("es", LongType),
    StructField("ts", LongType),
    StructField("data", ArrayType(payload)),
    StructField("old", ArrayType(payload)),
    StructField("_graft", StructType(Seq(
      StructField("key", LongType),
      StructField("commitTsUs", LongType),
      StructField("seq", LongType))))))

  /** Encode a canonical changelog into wire records: the broker
    * metadata columns the Topic sink routes/orders on (`key`,
    * `commit_ts_us`, `seq`, `op`) plus the JSON `envelope` value — the
    * Kafka record shape (key + timestamp + opaque value). DELETE rows
    * carry the deleted image in `data` (canal's convention); `old` is
    * the optional before-image struct column (null per row when the
    * feed doesn't carry one). */
  def encode(changelog: DataFrame, database: String, table: String,
             payloadCols: Seq[String],
             beforeCol: Option[String] = None): DataFrame = {
    val payload = struct(payloadCols.map(c => col(c).as(c)): _*)
    val payloadType = StructType(payloadCols.map(c => changelog.schema(c)))
    val old = beforeCol match {
      case Some(b) => when(col(b).isNotNull, array(col(b).cast(payloadType)))
      case None => lit(null).cast(ArrayType(payloadType))
    }
    changelog.select(
      col("key"), col("commit_ts_us"), col("seq"), col("op"),
      to_json(struct(
        col("seq").as("id"),
        lit(database).as("database"),
        lit(table).as("table"),
        array(lit("key")).as("pkNames"),
        lit(false).as("isDdl"),
        opToType(col("op")).as("type"),
        // canal's es is epoch-MILLIS; exact micros ride in _graft
        floor(col("commit_ts_us") / 1000L).cast("long").as("es"),
        floor(col("commit_ts_us") / 1000L).cast("long").as("ts"),
        array(payload).as("data"),
        old.as("old"),
        struct(
          col("key").as("key"),
          col("commit_ts_us").as("commitTsUs"),
          col("seq").as("seq")).as("_graft")
      )).as(EnvelopeCol))
  }

  /** Parse wire records back to the canonical changelog, classifying
    * every record instead of throwing: output = canonical columns
    * (null for bad records) + the raw envelope + `__envelope_error`
    * (null = clean). One `from_json` against the DECLARED schema;
    * PERMISSIVE nulls (unparseable JSON, type-mismatched fields)
    * surface as classified reasons, so a poisoned topic drains into a
    * quarantine instead of killing the consumer. */
  def decodeAll(wire: DataFrame, payload: StructType,
                database: String, table: String): DataFrame =
    decodeAll(wire, payload, database, table, includeBefore = false)

  /** [[decodeAll]], optionally surfacing the canal `old` before-image
    * as a `before` struct column (null when the event carried none). */
  def decodeAll(wire: DataFrame, payload: StructType,
                database: String, table: String,
                includeBefore: Boolean): DataFrame = {
    // PERMISSIVE from_json yields an all-null struct for unparseable
    // input — the corrupt-record column is the declared way to tell
    // "malformed" apart from "fields legitimately absent".
    //
    // PARSE ONCE: every Column reference below would otherwise clone
    // the whole JsonToStructs expression, and predicate pushdown /
    // project collapse re-inline the alias into every consumer — the
    // envelope was measured re-parsed ~15-25× per row without the
    // [[graft.functions.OptimizerBarrier]] (10-25× slower at sf0.1).
    // The barrier pins exactly one parse per row in its own projection.
    val corrupt = "_graft_corrupt"
    val parsed = wire.select(col(EnvelopeCol),
      graft.functions.Barrier.once(from_json(col(EnvelopeCol),
        wireSchema(payload).add(StructField(corrupt, StringType)),
        Map("columnNameOfCorruptRecord" -> corrupt).asJava)).as("__p"))
    val p = col("__p")
    val reason =
      when(col(EnvelopeCol).isNull, "null_envelope")
        .when(p.isNull || p.getField(corrupt).isNotNull, "malformed_json")
        // DDL classification BEFORE the _graft check: a DDL envelope
        // legitimately has no row _graft section (it carries _graft_ddl)
        .when(p.getField("isDdl").isNull || p.getField("isDdl"),
          "ddl_event_in_row_topic")
        .when(p.getField("_graft").isNull ||
          p.getField("_graft").getField("key").isNull ||
          p.getField("_graft").getField("commitTsUs").isNull ||
          p.getField("_graft").getField("seq").isNull, "missing_graft_meta")
        .when(typeToOp(p.getField("type")).isNull, "unknown_type")
        // null-safe: an ABSENT database/table field is wrong_table too
        // (=!= would yield null and let the envelope decode clean —
        // ADVICE r13)
        .when(!(p.getField("database") <=> database) ||
          !(p.getField("table") <=> table), "wrong_table")
        .when(p.getField("data").isNull || size(p.getField("data")) < 1,
          "missing_data")
    val g = p.getField("_graft")
    val row = element_at(p.getField("data"), 1)
    parsed.select(
      Seq(
        when(reason.isNull, g.getField("key")).as("key"),
        when(reason.isNull, g.getField("commitTsUs")).as("commit_ts_us"),
        when(reason.isNull, g.getField("seq")).as("seq"),
        when(reason.isNull, typeToOp(p.getField("type"))).as("op")) ++
      payload.fields.toSeq.map(f =>
        when(reason.isNull, row.getField(f.name)).as(f.name)) ++
      (if (includeBefore)
        Seq(when(reason.isNull,
          element_at(p.getField("old"), 1)).as("before"))
      else Nil) ++
      Seq(col(EnvelopeCol), reason.as("__envelope_error")): _*)
  }

  /** Clean canonical changelog rows only (the consumer's main path). */
  def decode(wire: DataFrame, payload: StructType,
             database: String, table: String,
             includeBefore: Boolean = false): DataFrame =
    decodeAll(wire, payload, database, table, includeBefore)
      .where(col("__envelope_error").isNull)
      .drop("__envelope_error", EnvelopeCol)

  /** The dead-letter split (raw envelope + reason — everything an
    * operator needs to replay after a codec fix). */
  def quarantine(wire: DataFrame, payload: StructType,
                 database: String, table: String): DataFrame =
    decodeAll(wire, payload, database, table)
      .where(col("__envelope_error").isNotNull)
      .select(col(EnvelopeCol), col("__envelope_error"))

  // ---------------------------------------------------------------------
  // DDL on the wire (canal's isDdl:true message; the reference's
  // EmitDDLEvent crossing the broker, README.md:63) — human-readable
  // `sql` for warehouse operators plus a `_graft_ddl` exactness section
  // so a consumer replays the DDL WITHOUT parsing SQL (the A47
  // ledger-field form, shipped in-band).
  // ---------------------------------------------------------------------

  private val ddlWireSchema: StructType = StructType(Seq(
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("isDdl", BooleanType),
    StructField("type", StringType),
    StructField("es", LongType),
    StructField("ts", LongType),
    StructField("sql", StringType),
    StructField("_graft_ddl", StructType(Seq(
      StructField("kind", StringType),
      StructField("a", StringType),
      StructField("b", StringType),
      StructField("ts", LongType))))))

  /** Render one DDL event envelope. Fields follow the A47 ledger form
    * (kind ∈ add|drop|rename; `a`/`b` operands — the add default is a
    * string literal, the only default a schema-less event carries
    * faithfully). */
  def encodeDdl(spark: org.apache.spark.sql.SparkSession,
                ddls: Seq[(String, String, String, Long)],
                database: String, table: String): DataFrame = {
    import spark.implicits._
    val canalType = Map("add" -> "ALTER", "drop" -> "ALTER",
      "rename" -> "ALTER")
    val rows = ddls.map { case (kind, a, b, ts) =>
      val sql = kind match {
        case "add" => s"ALTER TABLE $table ADD COLUMN $a VARCHAR DEFAULT '$b'"
        case "drop" => s"ALTER TABLE $table DROP COLUMN $a"
        case "rename" => s"ALTER TABLE $table RENAME COLUMN $a TO $b"
        case other => throw new IllegalArgumentException(
          s"unknown DDL kind: $other")
      }
      (kind, a, b, ts, sql, canalType(kind))
    }
    rows.toDF("kind", "a", "b", "ts_us", "sql", "canal_type")
      .select(col("ts_us").as("commit_ts_us"),
        to_json(struct(
          lit(database).as("database"),
          lit(table).as("table"),
          lit(true).as("isDdl"),
          col("canal_type").as("type"),
          floor(col("ts_us") / 1000L).cast("long").as("es"),
          floor(col("ts_us") / 1000L).cast("long").as("ts"),
          col("sql").as("sql"),
          struct(col("kind"), col("a"), col("b"),
            col("ts_us").as("ts")).as("_graft_ddl")
        )).as(EnvelopeCol))
  }

  /** Extract DDL events from a mixed wire stream: isDdl envelopes →
    * the (kind, a, b, ts_us) fields [[graft.cdc.SchemaEvolution]]
    * replays; row envelopes and garbage pass through untouched (they
    * belong to [[decodeAll]]). */
  def ddlEvents(wire: DataFrame): DataFrame = {
    // parse once behind its own projection (see decodeAll)
    val parsed = wire.select(
      graft.functions.Barrier.once(
        from_json(col(EnvelopeCol), ddlWireSchema)).as("__p"))
    val p = col("__p")
    parsed
      .where(p.getField("isDdl").isNotNull && p.getField("isDdl") &&
        p.getField("_graft_ddl").isNotNull)
      .select(
        p.getField("_graft_ddl").getField("kind").as("kind"),
        p.getField("_graft_ddl").getField("a").as("a"),
        p.getField("_graft_ddl").getField("b").as("b"),
        p.getField("_graft_ddl").getField("ts").as("ts_us"),
        p.getField("sql").as("sql"))
  }

  /** The DDL-candidate complement of [[ddlEvents]]: envelopes a
    * consumer classified `ddl_event_in_row_topic` (isDdl absent or
    * true) that [[ddlEvents]] would NOT consume — isDdl null (the flag
    * itself is missing, so the record is neither a row nor a replayable
    * DDL) or isDdl:true with no `_graft_ddl` exactness section (a
    * native canal DDL whose change this consumer cannot replay without
    * parsing SQL). They must drain into the envelope DLQ with their own
    * reason: dropping them silently would violate the poisoned-topic
    * quarantine contract (ADVICE r14). Returns (envelope, __dlq_reason). */
  def ddlRejects(wire: DataFrame): DataFrame = {
    val parsed = wire.select(col(EnvelopeCol),
      graft.functions.Barrier.once(
        from_json(col(EnvelopeCol), ddlWireSchema)).as("__p"))
    val p = col("__p")
    parsed
      .where(p.getField("isDdl").isNull || !p.getField("isDdl") ||
        p.getField("_graft_ddl").isNull)
      .select(col(EnvelopeCol),
        when(p.getField("isDdl").isNull, "ddl_flag_missing")
          .when(!p.getField("isDdl"), "ddl_flag_false")
          .otherwise("ddl_missing_graft_section").as("__dlq_reason"))
  }
}
