package graft

import org.apache.spark.sql.functions._

import graft.cdc.{Envelope, SchemaRegistry}

/** Schema-registry contracts (A72): the compatibility matrix per
  * level, rejected registrations leaving the registry untouched,
  * id/version assignment, and the mixed-id resolve path including the
  * loud unknown-id failure. */
class RegistrySpec extends SparkSpec {

  import spark.implicits._

  private val v1 = Seq("a" -> "BIGINT", "b" -> "VARCHAR")

  test("compat matrix: add/drop/widen/narrow/rename per level") {
    val add = v1 :+ ("c" -> "DOUBLE")
    val drop = Seq("a" -> "BIGINT")
    val widen = Seq("a" -> "HUGEINT", "b" -> "VARCHAR")
    val narrow = Seq("a" -> "INTEGER", "b" -> "VARCHAR")
    val rename = Seq("a" -> "BIGINT", "b2" -> "VARCHAR")
    def verdict(level: String, next: Seq[(String, String)]): Boolean = {
      val r = new SchemaRegistry.Registry(level)
      r.register("s", v1).fold(sys.error, identity)
      r.register("s", next).isRight
    }
    // BACKWARD: only narrowing breaks
    assert(verdict("BACKWARD", add))
    assert(verdict("BACKWARD", drop))
    assert(verdict("BACKWARD", widen))
    assert(!verdict("BACKWARD", narrow))
    assert(verdict("BACKWARD", rename)) // drop+add reads old data fine
    // FORWARD: drops, renames, and ANY type change break old readers
    assert(verdict("FORWARD", add))
    assert(!verdict("FORWARD", drop))
    assert(!verdict("FORWARD", widen))
    assert(!verdict("FORWARD", narrow))
    assert(!verdict("FORWARD", rename))
    // FULL: only pure adds
    assert(verdict("FULL", add))
    assert(!verdict("FULL", drop))
    // NONE: anything goes
    assert(verdict("NONE", narrow))
  }

  test("a rejected registration leaves the registry untouched and " +
    "names every offending column") {
    val r = new SchemaRegistry.Registry("BACKWARD")
    r.register("s", v1).fold(sys.error, identity)
    val bad = r.register("s",
      Seq("a" -> "INTEGER", "b" -> "SMALLINT"))
    assert(bad.isLeft)
    val msg = bad.left.toOption.get
    assert(msg.contains("a: breaking_type") && msg.contains("b: breaking_type"))
    assert(r.all.size === 1)
    assert(r.latest("s").get.version === 1)
    // ids keep counting monotonically across subjects, versions per subject
    r.register("t", v1).fold(sys.error, identity)
    val e3 = r.register("s", v1 :+ ("c" -> "DOUBLE"))
      .fold(sys.error, identity)
    assert(e3.id === 3 && e3.version === 2)
  }

  test("changeVerdicts agrees with the A43 compatReport classifier") {
    val next = Seq("a" -> "HUGEINT", "c" -> "VARCHAR") // widen a, b→c rename
    val mine = SchemaRegistry.changeVerdicts(v1, next).toMap
    val a43 = graft.cdc.SchemaEvolution.compatReport(spark, v1, next)
      .select("col_name", "verdict").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(mine === a43)
  }

  test("resolve: mixed-id wire splices to the latest schema; an " +
    "unregistered id fails loudly") {
    val reg = new SchemaRegistry.Registry("BACKWARD")
    reg.register("t", Seq("x" -> "DOUBLE")).fold(sys.error, identity)
    reg.register("t", Seq("x" -> "DOUBLE", "y" -> "VARCHAR"))
      .fold(sys.error, identity)
    val log1 = Seq((1L, 100L, 1L, "I", 1.5))
      .toDF("key", "commit_ts_us", "seq", "op", "x")
    val log2 = Seq((2L, 200L, 2L, "U", 2.5, "hi"))
      .toDF("key", "commit_ts_us", "seq", "op", "x", "y")
    val wire =
      Envelope.encode(log1, "db", "t", Seq("x"))
        .select(lit(1).as("schema_id"), col(Envelope.EnvelopeCol))
        .unionByName(Envelope.encode(log2, "db", "t", Seq("x", "y"))
          .select(lit(2).as("schema_id"), col(Envelope.EnvelopeCol)))
    val out = SchemaRegistry.resolve(wire, reg, "t", "db", "t")
      .orderBy("seq").select("key", "x", "y")
      .as[(Long, Double, Option[String])].collect()
    assert(out === Array((1L, 1.5, None), (2L, 2.5, Some("hi"))))
    val forged = wire.withColumn("schema_id", lit(99))
    val e = intercept[IllegalArgumentException](
      SchemaRegistry.resolve(forged, reg, "t", "db", "t").count())
    assert(e.getMessage.contains("never-registered"))
    // NULL framing must fail as loudly as a forged id — a null
    // schema_id would otherwise NULL the isin guard and then be
    // silently dropped by every per-id filter (ADVICE r15)
    val nullFramed = wire.withColumn("schema_id",
      lit(null).cast("int"))
    val e2 = intercept[IllegalArgumentException](
      SchemaRegistry.resolve(nullFramed, reg, "t", "db", "t").count())
    assert(e2.getMessage.contains("null or never-registered"))
  }
}
