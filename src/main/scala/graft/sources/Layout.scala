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

  /** Write `df` Z-ORDERED on two numeric keys: each key is min/max
    * normalized to `bits` bits, the bits are interleaved into one
    * Morton code, and files are range-partitioned + sorted on it.
    *
    * Why: range-sorting on ONE key gives perfect pruning on that key
    * and none on any other; interleaving makes every file a small
    * rectangle in (a, b) space, so predicates on EITHER key (or both)
    * prune — the multi-dimensional clustering Delta/Iceberg `OPTIMIZE
    * ZORDER BY` applies, built from public bit-interleaving math. The
    * only driver work is one 4-value min/max agg; the z-value itself
    * is a scan-local codegen'd projection, and balance under skew
    * comes from `repartitionByRange`'s sampling of the z-values. */
  def writeZOrdered(df: DataFrame, keyA: String, keyB: String,
                    numFiles: Int, path: String, bits: Int = 16): Unit = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val r = df.agg(min(col(keyA)).cast("double"), max(col(keyA)).cast("double"),
      min(col(keyB)).cast("double"), max(col(keyB)).cast("double")).first()
    val (aLo, aHi, bLo, bHi) =
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    val top = (1L << bits) - 1
    def scaled(c: String, lo: Double, hi: Double) =
      if (hi == lo) lit(0L)
      else floor((col(c).cast("double") - lit(lo)) / lit(hi - lo) * top)
        .cast("long")
    val za = scaled(keyA, aLo, aHi)
    val zb = scaled(keyB, bLo, bHi)
    // interleave: bit i of a → bit 2i+1, bit i of b → bit 2i
    val z = (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(za, i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftrightunsigned(zb, i).bitwiseAND(lit(1L)), 2 * i))
    }
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
