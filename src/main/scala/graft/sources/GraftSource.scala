package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.cdc.ChangeEvent

/** Source-side counterpart of [[graft.cdc.GraftSink]] (reference
  * README.md:21-25 — the changefeed may arrive from S3 files, Kafka-like
  * topics, or warehouse exports in any serialization).
  *
  * A changelog source is a format + path + explicit schema; reading
  * enforces the canonical change-event columns (key, commit_ts_us, seq,
  * op, payload...) so every downstream operator — batch or streaming —
  * is source-agnostic. Schema is always EXPLICIT: schema inference
  * re-reads data (a second full pass at 100 TB) and can silently widen
  * types between runs.
  */
object GraftSource {

  /** Batch read of a changelog directory. */
  def changelog(spark: SparkSession, path: String, schema: StructType,
                format: String = "parquet"): DataFrame = {
    var r = spark.read.format(format).schema(schema)
    if (format == "csv") r = r.option("header", "true")
    canonicalize(r.load(path))
  }

  /** Streaming read of a changelog directory (each new file = one
    * upstream flush). */
  def changelogStream(spark: SparkSession, path: String, schema: StructType,
                      format: String = "parquet",
                      maxFilesPerTrigger: Int = 1): DataFrame = {
    var r = spark.readStream.format(format).schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("latestFirst", "false")
    if (format == "csv") r = r.option("header", "true")
    canonicalize(r.load(path))
  }

  /** Validate + order the canonical columns first (payload after). */
  def canonicalize(df: DataFrame): DataFrame = {
    val missing = ChangeEvent.metaColumns.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"changelog source is missing canonical columns: ${missing.mkString(", ")}")
    val payload = df.columns.filterNot(ChangeEvent.metaColumns.contains)
    df.select((ChangeEvent.metaColumns ++ payload).map(col): _*)
  }
}
