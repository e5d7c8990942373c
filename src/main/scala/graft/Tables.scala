package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * The `events` table's `ts` column has shipped in two physical formats
  * across driver generations: parquet `timestamp[ns]` (read as raw nanos
  * via `spark.sql.legacy.parquet.nanosAsLong`) and parquet `timestamp[us]`
  * with `isAdjustedToUTC=false` (read as TIMESTAMP_NTZ). We branch on the
  * loaded dtype and normalize both to the same two columns: a proper `ts`
  * TimestampType (microsecond precision, UTC) and the raw `ts_us`
  * epoch-microsecond long used for engine-portable output. The session
  * timezone is pinned to UTC so the NTZ wall-clock equals the epoch
  * reading, matching DuckDB's `epoch_us(ts)` on the same parquet.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Defensive: our own mains set this at session construction, but
    // SparkEntry.entry/queries also run under driver-owned sessions that
    // don't. Idempotent runtime conf, safe to re-set per load.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") {
      df.schema("ts").dataType match {
        case LongType => // legacy timestamp[ns] read as raw nanos
          df.withColumn("ts_us", expr("ts div 1000"))
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampType | TimestampNTZType => // timestamp[us] parquet
          df.withColumn("ts", col("ts").cast(TimestampType))
            .withColumn("ts_us", unix_micros(col("ts")))
        case other =>
          throw new IllegalStateException(
            s"events.ts: unsupported parquet type $other")
      }
    } else df
  }

  def events(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "events")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
