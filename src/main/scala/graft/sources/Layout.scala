package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Data-layout writers — the scan-pruning story at 100 TB.
  *
  * Parquet keeps per-file and per-row-group min/max statistics; a
  * filter on a column only skips files when the WRITE clustered that
  * column, so layout is a first-class operator in a pipeline that reads
  * a table many more times than it writes it:
  *
  *  - [[writeRangeSorted]] — global range-partition + in-partition sort
  *    on the clustering key. Files end up with pairwise-disjoint
  *    [min, max] key ranges (pinned by LayoutSpec), so a point or range
  *    predicate prunes to the handful of files that can match — at
  *    100 TB the difference between scanning everything and scanning
  *    ~|selectivity|. Range partitioning samples the key distribution,
  *    so skewed keys still produce balanced files.
  *  - [[writeHivePartitioned]] — directory partitioning for LOW-
  *    cardinality keys (dates, splits, langs): partition pruning happens
  *    in the driver before any file is listed. Combine with
  *    `maxRecordsPerFile` so one hot partition value can't produce a
  *    giant file.
  *
  * Both are thin, deliberate wrappers: the value is the documented,
  * tested layout contract (disjoint ranges / pruned directories), not
  * the API surface.
  */
object Layout {

  /** Write `df` clustered by `keyCol`: `numFiles` range partitions,
    * rows sorted within each, one parquet file per partition. */
  def writeRangeSorted(df: DataFrame, keyCol: String, numFiles: Int,
                       path: String): Unit =
    df.repartitionByRange(numFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Write `df` hive-partitioned by `partCol` (low-cardinality), files
    * capped at `maxRecordsPerFile` rows. */
  def writeHivePartitioned(df: DataFrame, partCol: String, path: String,
                           maxRecordsPerFile: Long = 1000000L): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCol)
      .parquet(path)
}
