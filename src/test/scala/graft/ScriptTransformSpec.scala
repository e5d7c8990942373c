package graft

import org.apache.spark.sql.functions._

import graft.cdc._

/** In-process scripted plugin (reference README.md:39-43): scripts
  * compile to Catalyst expressions at Prepare time; limits and the
  * whitelist reject hostile scripts before anything is scheduled; a
  * script that binds to a missing column poisons its batch into the
  * DLQ like every other plugin form. */
class ScriptTransformSpec extends SparkSpec {

  import spark.implicits._

  private lazy val log = Changelog.fromEvents(Tables.events(spark, sfDir))

  test("a script compiles to exactly the hand-built combinator plan's " +
    "result (set/keep/drop over the row struct)") {
    val scripted = ScriptTransform.compile(
      "keep event_type != 'view' and value > 10;" +
        "set tier = if(value > 500, 'high', 'low');" +
        "set tag = concat(upper(event_type), '_', tier);" +
        "drop props")(log)
    val byHand = log
      .where(col("event_type") =!= "view" && col("value") > 10)
      .withColumn("tier", when(col("value") > 500, "high").otherwise("low"))
      .withColumn("tag",
        concat(upper(col("event_type")), lit("_"), col("tier")))
      .drop("props")
    assert(scripted.columns.toSeq === byHand.columns.toSeq)
    assert(scripted.exceptAll(byHand).count() === 0)
    assert(byHand.exceptAll(scripted).count() === 0)
    assert(byHand.count() > 0)
  }

  test("the scripted plugin FUSES into the chain's single plan — no " +
    "exchange, no interpreter node") {
    val out = ChainConfig.parse(
      "script:keep value > 10; set v2 = value * 2").run(log)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"a scripted projection must not shuffle:\n${plan.take(1500)}")
  }

  test("arithmetic, precedence, unary minus, parens, null, booleans") {
    val df = Seq((1L, 2.0), (2L, 10.0)).toDF("k", "v")
    val r = ScriptTransform.compile(
      "set a = 1 + 2 * 3; set b = (1 + 2) * 3; set c = -v + 1;" +
        "set d = coalesce(null, 7); set e = not (v > 5) or k = 2;" +
        "set f = 10 % 3; set g = substr('hello', 2, 3);" +
        "set h = lower('ABC'); set i = length('abcd'); set j = abs(0 - 2)")(df)
      .orderBy("k").collect()
    assert(r(0).getLong(2) === 7L)      // a: precedence
    assert(r(0).getLong(3) === 9L)      // b: parens
    assert(r(0).getDouble(4) === -1.0)  // c: unary minus
    assert(r(0).getLong(5) === 7L)      // d: coalesce/null
    assert(r(0).getBoolean(6) === true) // e: not/or grouping (2 > 5 false)
    assert(r(1).getBoolean(6) === true) // e: k = 2 branch
    assert(r(0).getLong(7) === 1L)      // f: modulo
    assert(r(0).getString(8) === "ell") // g: substr
    assert(r(0).getString(9) === "abc") // h
    assert(r(0).getLong(10) === 4L)     // i
    assert(r(0).getLong(11) === 2L)     // j
  }

  test("string literals escape '' and honor the literal-size limit") {
    val df = Seq(1).toDF("k")
    val r = ScriptTransform.compile("set s = 'it''s fine'")(df).collect()
    assert(r(0).getString(1) === "it's fine")
    val big = "set s = '" + "x" * 300 + "'"
    val e = intercept[IllegalArgumentException](ScriptTransform.compile(big))
    assert(e.getMessage.contains("literal exceeds"))
  }

  test("Prepare-time limits reject hostile scripts loudly") {
    // byte bomb
    val long = ("set a = 1;" * 600)
    assert(intercept[IllegalArgumentException](
      ScriptTransform.compile(long)).getMessage.contains("bytes"))
    // statement bomb (under the byte cap, over the statement cap)
    val many = (1 to 40).map(i => s"set a$i = 1").mkString(";")
    assert(intercept[IllegalArgumentException](
      ScriptTransform.compile(many)).getMessage.contains("statements"))
    // nesting bomb: would be a parser StackOverflow without the guard
    val deep = "keep " + "(" * 50 + "1" + ")" * 50 + " = 1"
    assert(intercept[IllegalArgumentException](
      ScriptTransform.compile(deep)).getMessage.contains("nesting"))
  }

  test("the function whitelist is the sandbox: unknown functions are " +
    "rejected with the whitelist named") {
    val e = intercept[IllegalArgumentException](
      ScriptTransform.compile("set x = reflect('java.lang.System', 'exit')"))
    assert(e.getMessage.contains("unknown function"))
    assert(e.getMessage.contains("coalesce")) // names the whitelist
    // arity violations are compile-time too
    assert(intercept[IllegalArgumentException](
      ScriptTransform.compile("set x = upper('a', 'b')"))
      .getMessage.contains("argument count"))
    // grammar violations name the offending token
    assert(intercept[IllegalArgumentException](
      ScriptTransform.compile("explode everything"))
      .getMessage.contains("expected 'set', 'keep' or 'drop'"))
    assert(intercept[IllegalArgumentException](
      ScriptTransform.compile("set x = 'unterminated"))
      .getMessage.contains("unterminated"))
  }

  test("a malformed number (two dots) fails at tokenize time with token " +
    "context, never a raw NumberFormatException") {
    val e = intercept[IllegalArgumentException](
      ScriptTransform.compile("set x = 1.2.3"))
    assert(e.getMessage.contains("illegal character"), e.getMessage)
    // a single dot still parses as a double; trailing dot is 1.0
    val df = Seq(1).toDF("k")
    val r = ScriptTransform.compile("set a = 1.5 * 2; set b = 3. + 1")(df)
      .collect()
    assert(r(0).getDouble(1) === 3.0)
    assert(r(0).getDouble(2) === 4.0)
  }

  test("a script binding a MISSING column poisons its micro-batch into " +
    "the DLQ — the feed survives (violation → DLQ)") {
    import java.nio.file.Files
    val feed = log.limit(100)
    val inDir = graft.queries.Cdc.streamSliceDir(spark, feed, sfDir,
      slices = 2, orderCols = Seq(col("commit_ts_us"), col("seq")),
      tag = "spec_script_dlq")
    val sink = Files.createTempDirectory("script_sink").toString
    val dlq = Files.createTempDirectory("script_dlq").toString
    val chain = ChainConfig.parse("script:set x = no_such_column + 1")
    val q = graft.streaming.CdcStream.deliverWithDlq(
      graft.streaming.CdcStream.fromParquetDir(spark, inDir, feed.schema),
      chain,
      GraftSink.Files(sink + "/out"),
      tag => GraftSink.Files(dlq + "/" + tag),
      Files.createTempDirectory("script_ckpt").toString)
    q.awaitTermination()
    // every batch quarantined raw, none delivered, query finished
    import scala.jdk.CollectionConverters._
    val dlqDirs = Files.list(java.nio.file.Paths.get(dlq))
      .iterator().asScala.toSeq
    assert(dlqDirs.nonEmpty, "the poison batches must be quarantined")
    val quarantined = spark.read.parquet(dlqDirs.map(_.toString): _*)
    assert(quarantined.count() === feed.count())
    assert(quarantined.columns.contains("__dlq_reason"))
  }

  test("register: a named script resolves through transform: like any " +
    "other plugin") {
    ScriptTransform.register("script-tier",
      "set tier = if(value > 500, 'high', 'low')")
    try {
      val out = ChainConfig.parse(
        "event-filter:purchase | transform:script-tier").run(log)
      assert(out.columns.contains("tier"))
      assert(out.where(col("tier") =!= when(col("value") > 500, "high")
        .otherwise("low")).count() === 0)
    } finally ChainConfig.unregisterTransform("script-tier")
  }
}
