package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Layout

class LayoutSpec extends SparkSpec {

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  test("writeRangeSorted produces pairwise-disjoint per-file key ranges " +
    "(the property parquet min/max pruning needs)") {
    val out = tmp("range-sorted") + "/orders"
    Layout.writeRangeSorted(
      Tables.orders(spark, sfDir), "o_orderkey", numFiles = 8, out)
    val files = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length === 8)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("o_orderkey"), max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file ranges overlap: $hi >= $lo2")
      case _ =>
    }
    // nothing lost in the rewrite
    val n = spark.read.parquet(out).count()
    assert(n === Tables.orders(spark, sfDir).count())
  }

  test("a selective key filter decodes a fraction of the rows on the " +
    "range-sorted layout, but everything on a shuffled layout") {
    val orders = Tables.orders(spark, sfDir)
    val total = orders.count()
    val maxKey = orders.agg(max("o_orderkey")).head().getLong(0)

    // parquet filter pushdown skips whole row groups by min/max: with
    // disjoint per-file ranges only the matching file's group survives;
    // with a shuffled layout every group spans the full key range and
    // nothing can be skipped. The scan node's numOutputRows = decoded
    // rows, so it observes exactly this.
    def decodedRows(path: String): Long = {
      val q = spark.read.parquet(path)
        .where(col("o_orderkey") <= maxKey / 16)
      q.collect() // execute THIS queryExecution so its metrics populate
      q.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).max
    }

    val sorted = tmp("range-pruned") + "/sorted"
    Layout.writeRangeSorted(orders, "o_orderkey", numFiles = 8, sorted)
    val shuffled = tmp("range-pruned") + "/shuffled"
    orders.repartition(8) // round-robin: every file spans the key range
      .write.parquet(shuffled)

    val (fromSorted, fromShuffled) = (decodedRows(sorted), decodedRows(shuffled))
    assert(fromShuffled === total,
      s"shuffled layout can skip nothing, decoded $fromShuffled of $total")
    assert(fromSorted <= total / 4,
      s"sorted layout should row-group-skip most of the table, decoded $fromSorted of $total")
  }

  test("writeZOrdered gives per-file pruning on BOTH keys; single-key " +
    "range sort prunes only its own key") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val nFiles = 8

    val zed = tmp("zorder") + "/li"
    Layout.writeZOrdered(li, "l_partkey", "l_suppkey", nFiles, zed)
    val ranged = tmp("zorder") + "/li-ranged"
    Layout.writeRangeSorted(li, "l_partkey", nFiles, ranged)

    def fileRanges(path: String, c: String): Array[(Long, Long)] =
      new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map { f =>
          val r = spark.read.parquet(f.toString).agg(min(c), max(c)).head()
          (r.getLong(0), r.getLong(1))
        }

    val pMax = li.agg(max("l_partkey")).head().getLong(0)
    val sMax = li.agg(max("l_suppkey")).head().getLong(0)
    // a 1/4-width band predicate on each key: count files whose
    // [min,max] intersects it (what parquet min/max pruning consults)
    def matching(ranges: Array[(Long, Long)], lo: Long, hi: Long): Int =
      ranges.count { case (mn, mx) => mx >= lo && mn <= hi }

    val zPart = matching(fileRanges(zed, "l_partkey"), 0, pMax / 4)
    val zSupp = matching(fileRanges(zed, "l_suppkey"), 0, sMax / 4)
    val rPart = matching(fileRanges(ranged, "l_partkey"), 0, pMax / 4)
    val rSupp = matching(fileRanges(ranged, "l_suppkey"), 0, sMax / 4)

    // single-key sort: perfect on its key, zero pruning on the other
    assert(rPart <= nFiles / 2)
    assert(rSupp === nFiles, "range layout cannot prune the second key")
    // z-order: BOTH keys prune (each band predicate skips some files)
    assert(zPart < nFiles, s"zorder should prune l_partkey files ($zPart)")
    assert(zSupp < nFiles, s"zorder should prune l_suppkey files ($zSupp)")
    // nothing lost
    assert(spark.read.parquet(zed).count() === li.count())
  }

  test("writeHivePartitioned prunes partitions in the driver: one " +
    "directory per value, filtered scans list only matching dirs") {
    val out = tmp("hive-part") + "/events"
    Layout.writeHivePartitioned(
      Tables.events(spark, sfDir).withColumn("ts", col("ts_us")), // drop ntz
      "event_type", out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.length === 5 && dirs.forall(_.startsWith("event_type=")))
    val one = spark.read.parquet(out)
      .where(col("event_type") === "purchase")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter must reach the scan:\n$plan")
    assert(one.count() ===
      Tables.events(spark, sfDir)
        .where(col("event_type") === "purchase").count())
  }
}
