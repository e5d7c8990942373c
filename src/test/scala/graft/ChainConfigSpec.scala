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

  test("malformed configs fail loudly") {
    assert(intercept[IllegalArgumentException](
      ChainConfig.parse("nonsense:x")).getMessage.contains("unknown stage"))
    assert(intercept[IllegalArgumentException](
      ChainConfig.parse("mask:props=rot13")).getMessage.contains("unknown mask"))
    assert(intercept[IllegalArgumentException](
      ChainConfig.parse("route:keymod")).getMessage.contains("route needs"))
  }
}
