package graft

import org.apache.spark.sql.functions._

import graft.cdc._

class ChangefeedSpec extends SparkSpec {

  private lazy val log = Changelog.fromEvents(Tables.events(spark, sfDir))

  test("Mask.Sha256 is the hex sha256 of the string form") {
    import spark.implicits._
    val out = Seq(("42")).toDF("v")
      .select(Mask(col("v"), Mask.Sha256).as("h")).first().getString(0)
    assert(out === "73475cb40a568e8da8a045ced110137e159f890ac4da883b6b17dc651b3a8049")
  }

  test("Mask.RedactKeepLast keeps the tail only when strictly longer than it") {
    import spark.implicits._
    val out = Seq("secretvalue", "abcd", "ab", "").toDF("v")
      .select(Mask(col("v"), Mask.RedactKeepLast(4)).as("m"))
      .collect().map(_.getString(0))
    assert(out === Array("****alue", "****", "****", "****"))
  }

  test("Mask.NullOut nulls the column") {
    val masked = MaskPlugin(Seq("props"), Mask.NullOut)(log)
    assert(masked.where(col("props").isNotNull).count() === 0)
  }

  test("OpFilter keeps only the allowed ops") {
    val out = OpFilter(Set("I"))(log)
    assert(out.count() > 0)
    assert(out.where(col("op") =!= "I").count() === 0)
  }

  test("Route.KeyMod routes to key % n") {
    val routed = RoutePlugin(Route.KeyMod, 16)(log)
    assert(routed.where(col("__partition") =!= pmod(col("key"), lit(16L))).count() === 0)
  }

  test("Route.KeyHash is stable and in range") {
    val routed = RoutePlugin(Route.KeyHash, 16)(log)
    assert(routed.where(col("__partition") < 0 || col("__partition") >= 16).count() === 0)
    // stable: every key maps to exactly one partition
    assert(routed.groupBy("key").agg(countDistinct("__partition").as("n"))
      .where(col("n") > 1).count() === 0)
  }

  test("Route.ByEventType sends one event type to one partition") {
    val routed = RoutePlugin(Route.ByEventType, 8)(log)
    assert(routed.groupBy("event_type")
      .agg(countDistinct("__partition").as("n"))
      .where(col("n") > 1).count() === 0)
  }

  test("RoutePlugin(physical=true) actually repartitions") {
    val routed = RoutePlugin(Route.KeyMod, 8, physical = true)(log)
    assert(routed.rdd.getNumPartitions === 8)
    // co-location: every route value lands in exactly ONE physical
    // partition (hash partitioning may map several routes to the same
    // physical partition, but never splits one route across partitions)
    val perRoute = routed
      .withColumn("__pid", spark_partition_id())
      .groupBy("__partition").agg(countDistinct("__pid").as("n"))
    assert(perRoute.where(col("n") > 1).count() === 0)
  }

  test("UpdateDiffPlugin emits per-event deltas from the before-image") {
    val out = Changefeed(Seq(
      UpdateDiffPlugin(payloadCols = Seq("event_type", "value"),
        numericCols = Seq("value")))).run(log)
    // inserts have no prior image -> null delta
    assert(out.where(col("op") === "I" && col("value_delta").isNotNull)
      .count() === 0)
    // deltas reproduce value - lag(value) per key
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("key").orderBy("commit_ts_us", "seq")
    val bad = out
      .withColumn("expected", col("value") - lag(col("value"), 1).over(w))
      .where(col("op") =!= "I" && col("value_delta").isNotNull
        && col("value_delta") =!= col("expected"))
    assert(bad.count() === 0)
  }

  test("Changefeed applies plugins in order") {
    // filter first, then mask: masked output only contains purchases
    val out = Changefeed(Seq(
      EventTypeFilter(Set("purchase")),
      MaskPlugin(Seq("event_type"), Mask.RedactKeepLast(2)))).run(log)
    assert(out.count() > 0)
    assert(out.where(col("event_type") =!= "****se").count() === 0)
  }

  test("diagnose: clean chain reports every plugin Ok") {
    val checks = Changefeed(Seq(
      EventTypeFilter(Set("purchase")),
      MaskPlugin(Seq("props"), Mask.Sha256))).diagnose(spark, log.schema)
    assert(checks.map(_.status) === Seq(PluginCheck.Ok, PluginCheck.Ok))
    assert(checks.forall(_.error.isEmpty))
  }

  test("diagnose: the breaking plugin is named Failed, downstream is " +
    "NotReached, upstream stays Ok — and the validator itself survives") {
    val checks = Changefeed(Seq(
      EventTypeFilter(Set("purchase")),                     // fine
      PredicateFilter("broken", col("no_such_col") > 0),    // analysis error
      MaskPlugin(Seq("props"), Mask.Sha256)))               // after the break
      .diagnose(spark, log.schema)
    assert(checks.map(_.status) ===
      Seq(PluginCheck.Ok, PluginCheck.Failed, PluginCheck.NotReached))
    assert(checks(1).plugin === "broken")
    assert(checks(1).error.exists(_.contains("no_such_col")))
  }

  test("diagnose: a plugin that THROWS at construction time is caught, " +
    "not propagated (failure isolation)") {
    val checks = Changefeed(Seq(
      TransformPlugin("explodes", _ => sys.error("plugin bug")),
      EventTypeFilter(Set("purchase"))))
      .diagnose(spark, log.schema)
    assert(checks.map(_.status) ===
      Seq(PluginCheck.Failed, PluginCheck.NotReached))
    assert(checks.head.error.exists(_.contains("plugin bug")))
  }

  test("history: intervals chain per key, delete closes without opening, " +
    "live version open-ended") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, 1L, "I"), (1L, 20L, 2L, "U"), (1L, 30L, 3L, "D"),
      (2L, 15L, 4L, "I"), (2L, 25L, 5L, "U"))
      .toDF("key", "commit_ts_us", "seq", "op")
    val h = Materialize.history(log)
      .as[(Long, Long, String, Long, Option[Long])].collect()
      .map(r => r._2 -> r).toMap
    // key 1: I valid [10,20), U valid [20,30) closed by the delete;
    // the delete row itself emits no interval
    assert(h(1L)._4 === 10L && h(1L)._5 === Some(20L))
    assert(h(2L)._4 === 20L && h(2L)._5 === Some(30L))
    assert(!h.contains(3L))
    // key 2: U still live -> open-ended
    assert(h(5L)._5 === None)
    assert(h(4L)._5 === Some(25L))
  }
}
