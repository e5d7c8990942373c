package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The TiValue plugin chain, Spark-first (reference README.md:37-56).
  *
  * The reference lets users inject custom sink-side processing (WASM / .so /
  * Lua plugins) between the changefeed and the sink: filtering, masking,
  * partition routing, correction. On Spark the natural form of a "plugin"
  * is a named `DataFrame => DataFrame` transform; a changefeed is a fold
  * over an ordered chain of them. Each plugin stays declarative, so
  * Catalyst fuses the whole chain into one plan (filters push to the scan,
  * projections prune columns) — a per-row callback API would defeat that.
  */
trait Plugin extends Serializable {
  def name: String
  def apply(df: DataFrame): DataFrame
}

/** Keep only the named event/op types (TiCDC filter config). */
final case class OpFilter(allowed: Set[String]) extends Plugin {
  val name = s"op-filter[${allowed.mkString(",")}]"
  def apply(df: DataFrame): DataFrame = df.where(col("op").isin(allowed.toSeq: _*))
}

final case class EventTypeFilter(allowed: Set[String]) extends Plugin {
  val name = s"event-type-filter[${allowed.mkString(",")}]"
  def apply(df: DataFrame): DataFrame =
    df.where(col("event_type").isin(allowed.toSeq: _*))
}

/** Arbitrary predicate filter (host_call-style correction/filtering,
  * reference README.md:88). */
final case class PredicateFilter(name: String, cond: Column) extends Plugin {
  def apply(df: DataFrame): DataFrame = df.where(cond)
}

/** Sensitive-field masking (reference README.md:26). */
final case class MaskPlugin(columns: Seq[String], mode: Mask.Mode) extends Plugin {
  val name = s"mask[${columns.mkString(",")}:$mode]"
  def apply(df: DataFrame): DataFrame =
    columns.foldLeft(df)((d, c) => d.withColumn(c, Mask(col(c), mode)))
}

/** Custom partition routing (reference README.md:23 — Kafka partitioner
  * strategies). Adds a `__partition` column and, when `physical`, actually
  * repartitions so downstream per-partition sinks see co-located keys.
  */
final case class RoutePlugin(strategy: Route.Strategy, numPartitions: Int,
                             physical: Boolean = false) extends Plugin {
  val name = s"route[$strategy/$numPartitions]"
  def apply(df: DataFrame): DataFrame = {
    val routed = df.withColumn("__partition", Route(strategy, numPartitions, df))
    if (physical) routed.repartition(numPartitions, col("__partition")) else routed
  }
}

/** Free-form transform — the general plugin escape hatch. */
final case class TransformPlugin(name: String, fn: DataFrame => DataFrame) extends Plugin {
  def apply(df: DataFrame): DataFrame = fn(df)
}

/** Update-diff plugin (reference README.md:62,88 — correction/diff
  * plugins need the before image): attaches before-images for the given
  * payload columns and emits per-event deltas for the numeric ones.
  * Inserts (no prior image) get null deltas. */
final case class UpdateDiffPlugin(payloadCols: Seq[String],
                                  numericCols: Seq[String]) extends Plugin {
  val name = s"update-diff[${numericCols.mkString(",")}]"
  def apply(df: DataFrame): DataFrame = {
    val withBefore = Changelog.withBeforeImages(df, payloadCols)
    numericCols.foldLeft(withBefore) { (d, c) =>
      d.withColumn(s"${c}_delta", col(c) - col(s"before.$c"))
    }
  }
}

object Mask {
  sealed trait Mode
  /** sha256 hex digest of the string form — stable, join-preserving. */
  case object Sha256 extends Mode
  /** Keep last `keep` chars, star the rest (fixed-width redaction).
    * Values no longer than `keep` chars are fully redacted — otherwise a
    * short secret would leak in full (and Spark/DuckDB disagree on
    * negative-offset substring for short strings). */
  final case class RedactKeepLast(keep: Int) extends Mode
  /** Null out entirely. */
  case object NullOut extends Mode

  def apply(c: Column, mode: Mode): Column = mode match {
    case Sha256 => sha2(c.cast("string"), 256)
    case RedactKeepLast(k) =>
      val s = c.cast("string")
      when(length(s) <= k, lit("****"))
        .otherwise(concat(lit("****"), substring(s, -k, k)))
    case NullOut => lit(null).cast("string")
  }
}

object Route {
  sealed trait Strategy
  /** key mod N — deterministic, engine-portable (oracle-friendly). */
  case object KeyMod extends Strategy
  /** murmur3 hash of key mod N — what a real Kafka partitioner does. */
  case object KeyHash extends Strategy
  /** route by event type (table-ish routing). */
  case object ByEventType extends Strategy

  def apply(strategy: Strategy, n: Int, df: DataFrame): Column = strategy match {
    case KeyMod      => pmod(col("key"), lit(n.toLong))
    case KeyHash     => pmod(hash(col("key")), lit(n))
    case ByEventType => pmod(abs(xxhash64(col("event_type"))), lit(n.toLong))
  }
}

/** Per-plugin validation verdict from [[Changefeed.diagnose]]. */
final case class PluginCheck(plugin: String, status: PluginCheck.Status,
                             error: Option[String])
object PluginCheck {
  sealed trait Status
  /** Analyzed cleanly against the incoming schema. */
  case object Ok extends Status
  /** This plugin is the one that breaks the chain. */
  case object Failed extends Status
  /** Downstream of the failure — not meaningfully checkable. */
  case object NotReached extends Status
}

/** An ordered plugin chain over a changelog. */
final case class Changefeed(plugins: Seq[Plugin]) {
  def run(changelog: DataFrame): DataFrame =
    plugins.foldLeft(changelog)((df, p) => p(df))

  /** Run the chain and deliver to a sink (the full reference pipeline:
    * changefeed → plugins → sink, README.md:37-56). */
  def runTo(changelog: DataFrame, sink: GraftSink): Unit =
    sink.write(run(changelog))

  /** Per-plugin validation (the RFC future-work safety item: a bad
    * plugin must FAIL VALIDATION, not crash the feed): analyze the
    * chain stage by stage over an empty frame of `schema`, attributing
    * the first failure to the specific plugin that introduced it.
    * Everything downstream of a failure is `NotReached` (its input
    * schema is unknowable). Construction-time exceptions and analysis
    * exceptions are both caught — a plugin can't take the validator
    * down either way. Used by [[graft.streaming.ChainRollout]].prepare
    * so a staged chain is rejected WITH the culprit's name. */
  def diagnose(spark: org.apache.spark.sql.SparkSession,
               schema: org.apache.spark.sql.types.StructType): Seq[PluginCheck] = {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val (checks, _) = plugins.foldLeft(
      (Vector.empty[PluginCheck], Option(empty))) {
      case ((acc, None), p) =>
        (acc :+ PluginCheck(p.name, PluginCheck.NotReached, None), None)
      case ((acc, Some(df)), p) =>
        try {
          val out = p(df)
          out.schema // force analysis
          (acc :+ PluginCheck(p.name, PluginCheck.Ok, None), Some(out))
        } catch {
          case e: Exception =>
            (acc :+ PluginCheck(p.name, PluginCheck.Failed,
              Some(e.getMessage)), None)
        }
    }
    checks
  }
}
