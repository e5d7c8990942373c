package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-table changefeeds (reference README.md:61,66 — AddTable /
  * RemoveTable: a changefeed is split into per-table pipelines spread
  * across processors).
  *
  * Spark-first: one feed per table, each with its own plugin chain;
  * AddTable/RemoveTable are immutable feed-set updates. [[run]] unions
  * the per-table outputs under a `__table` discriminator and [[runTo]]
  * writes them hive-partitioned by table — on a cluster each table's
  * partition set is processed and written independently, which IS the
  * per-table pipeline split (data-parallel, not driver-thread-parallel).
  */
final case class MultiTableChangefeed(
    feeds: Map[String, (DataFrame, Changefeed)]) {

  /** AddTable (reference README.md:61). */
  def addTable(name: String, changelog: DataFrame,
               chain: Changefeed = Changefeed(Nil)): MultiTableChangefeed =
    copy(feeds = feeds + (name -> (changelog, chain)))

  /** RemoveTable (reference README.md:66). */
  def removeTable(name: String): MultiTableChangefeed =
    copy(feeds = feeds - name)

  def tables: Set[String] = feeds.keySet

  /** Union of every table's chained output, tagged with `__table`.
    * Schemas may differ across tables — missing columns null-fill. */
  def run(): DataFrame = {
    require(feeds.nonEmpty, "changefeed has no tables")
    feeds.toSeq.sortBy(_._1).map { case (name, (log, chain)) =>
      chain.run(log).withColumn("__table", lit(name))
    }.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Deliver all tables to one sink, partitioned by table. */
  def runTo(sink: GraftSink.Files): Unit =
    sink.copy(partitionColumns = "__table" +: sink.partitionColumns)
      .write(run())

  /** Per-table resolved-ts (min over tables = the changefeed's global
    * checkpoint ts, reference README.md:64-65). */
  def resolvedTs(numPipelines: Int = 32): DataFrame =
    feeds.toSeq.sortBy(_._1).map { case (name, (log, _)) =>
      Materialize.resolvedTs(log, numPipelines).withColumn("__table", lit(name))
    }.reduce(_.unionByName(_))
}

object MultiTableChangefeed {
  def empty: MultiTableChangefeed = MultiTableChangefeed(Map.empty)
}
