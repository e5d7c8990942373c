package graft

import org.apache.spark.sql.functions._

import graft.cdc._

class ChainConfigSpec extends SparkSpec {

  private lazy val log = Changelog.fromEvents(Tables.events(spark, sfDir))

  test("a config string compiles to the same chain as code") {
    val fromConfig = ChainConfig.parse(
      "event-filter:purchase,click | where:value > 100").run(log)
    val fromCode = Changefeed(Seq(
      EventTypeFilter(Set("purchase", "click")),
      PredicateFilter("hv", col("value") > 100))).run(log)
    assert(fromConfig.exceptAll(fromCode).count() === 0)
    assert(fromCode.exceptAll(fromConfig).count() === 0)
  }

  test("full chain: filter, mask, route, select") {
    val out = ChainConfig.parse(
      "op-filter:U | mask:props=keep2,event_type=sha256 | " +
        "route:keymod/8 | select:seq,key,props,__partition").run(log)
    assert(out.columns.toSeq === Seq("seq", "key", "props", "__partition"))
    assert(out.count() > 0)
    assert(out.where(!col("props").startsWith("****")).count() === 0)
    assert(out.where(col("__partition") =!= pmod(col("key"), lit(8L))).count() === 0)
  }

  test("physical route flag repartitions") {
    val out = ChainConfig.parse("route:keyhash/4/physical").run(log)
    assert(out.rdd.getNumPartitions === 4)
  }

  test("transform: stage resolves a runtime-registered transform by name " +
    "(the no-recompilation plugin boundary)") {
    ChainConfig.registerTransform("double-value",
      df => df.withColumn("value", col("value") * 2))
    try {
      val out = ChainConfig.parse(
        "event-filter:purchase | transform:double-value").run(log)
      val reference = Changefeed(Seq(
        EventTypeFilter(Set("purchase")),
        TransformPlugin("x", df => df.withColumn("value", col("value") * 2))))
        .run(log)
      assert(out.exceptAll(reference).count() === 0)
      assert(reference.exceptAll(out).count() === 0)
    } finally ChainConfig.unregisterTransform("double-value")
  }

  test("transform: unknown name fails at run time with a registration hint") {
    val chain = ChainConfig.parse("transform:not-registered") // parse is fine
    val e = intercept[IllegalArgumentException](chain.run(log))
    assert(e.getMessage.contains("registerTransform"))
  }

  test("sql: stage runs session-registered functions - the multi-language " +
    "UDF boundary (python/any binding registers, the chain references)") {
    // stand-in for a UDF registered from another language binding: the
    // registration API and the resulting catalog entry are identical
    spark.udf.register("chain_bump", (v: Double) => v + 1000.0)
    val out = ChainConfig.parse(
      "event-filter:purchase | sql:SELECT key, chain_bump(value) AS value FROM __input__")
      .run(log)
    val reference = Changefeed(Seq(EventTypeFilter(Set("purchase")))).run(log)
      .selectExpr("key", "value + 1000.0 AS value")
    assert(out.columns.toSeq === Seq("key", "value"))
    assert(out.exceptAll(reference).count() === 0)
    assert(reference.exceptAll(out).count() === 0)
  }

  test("transform: stage round-trips rows through an external python3 " +
    "process — the out-of-process multi-language plugin boundary") {
    // The RFC's plugin-runner pitch (README.md:44-48): a plugin in a
    // foreign runtime, attached by config, no pipeline recompilation.
    // RDD.pipe spawns the process per partition; rows cross as JSON
    // lines; the declared schema re-types the output.
    val script =
      """import sys, json
        |for line in sys.stdin:
        |    r = json.loads(line)
        |    print(json.dumps({"seq": r["seq"], "key": r["key"],
        |                      "tag": "py:%d" % (r["key"] % 10)}))
        |""".stripMargin
    PipedTransform.register("py-tag",
      Seq("python3", "-u", "-c", script),
      "seq BIGINT, key BIGINT, tag STRING")
    try {
      val out = ChainConfig.parse(
        "op-filter:U | select:seq,key | transform:py-tag").run(log)
      val reference = ChainConfig.parse("op-filter:U | select:seq,key")
        .run(log)
      assert(out.columns.toSeq === Seq("seq", "key", "tag"))
      assert(out.count() === reference.count())
      assert(out.where(
        col("tag") =!= concat(lit("py:"), pmod(col("key"), lit(10L))))
        .count() === 0)
    } finally ChainConfig.unregisterTransform("py-tag")
  }

  test("strict piped transform fails the batch on unparseable plugin " +
    "output — the poison-batch DLQ trigger") {
    val bad = "import sys\n" +
      "for line in sys.stdin:\n" +
      "    print('definitely-not-json')"
    PipedTransform.register("py-bad",
      Seq("python3", "-u", "-c", bad), "seq BIGINT")
    try {
      val chain = ChainConfig.parse("op-filter:U | transform:py-bad")
      val e = intercept[Throwable](chain.run(log).collect())
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else String.valueOf(t.getMessage) +: messages(t.getCause)
      assert(messages(e).exists(m => m.contains("Malformed") ||
        m.contains("FAILFAST") || m.contains("malformed")),
        s"expected a FAILFAST parse failure, got: ${messages(e)}")
    } finally ChainConfig.unregisterTransform("py-bad")
  }

  test("malformed configs fail loudly") {
    assert(intercept[IllegalArgumentException](
      ChainConfig.parse("nonsense:x")).getMessage.contains("unknown stage"))
    assert(intercept[IllegalArgumentException](
      ChainConfig.parse("mask:props=rot13")).getMessage.contains("unknown mask"))
    assert(intercept[IllegalArgumentException](
      ChainConfig.parse("route:keymod")).getMessage.contains("route needs"))
  }
}
