package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DDL events over a changefeed (reference README.md:63 — EmitDDLEvent).
  *
  * TiCDC interleaves DDL events with row changes; sinks must evolve the
  * downstream schema. Spark-first, a DDL is a schema transform applied to
  * the changelog DataFrame — a pure projection, so it fuses into the scan
  * and costs nothing at any scale. [[splice]] merges feed segments
  * written under different historical schemas into the current one
  * (missing columns null-filled, then defaults applied), which is how a
  * 100 TB backfill over years of schema history stays a single plan.
  */
object SchemaEvolution {

  sealed trait Ddl { def commitTsUs: Long }

  /** Add a column; rows from before the DDL (and segments that never had
    * it) read `default`. */
  final case class AddColumn(name: String, default: Column,
                             commitTsUs: Long = 0L) extends Ddl
  final case class DropColumn(name: String, commitTsUs: Long = 0L) extends Ddl
  final case class RenameColumn(from: String, to: String,
                                commitTsUs: Long = 0L) extends Ddl

  /** Apply one DDL to a changelog. */
  def apply(df: DataFrame, ddl: Ddl): DataFrame = ddl match {
    case AddColumn(name, default, _) =>
      if (df.columns.contains(name)) df.withColumn(name, coalesce(col(name), default))
      else df.withColumn(name, default)
    case DropColumn(name, _) => df.drop(name)
    case RenameColumn(from, to, _) => df.withColumnRenamed(from, to)
  }

  /** Apply an ordered DDL history. */
  def evolve(df: DataFrame, ddls: Seq[Ddl]): DataFrame =
    ddls.sortBy(_.commitTsUs).foldLeft(df)(apply)

  /** Downstream-dialect type name for a Spark type (the vocabulary the
    * DDL planner and the DuckDB oracle share). */
  def dialectType(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType => "BIGINT"
      case IntegerType => "INTEGER"
      case DoubleType => "DOUBLE"
      case StringType => "VARCHAR"
      case TimestampType | TimestampNTZType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case other => other.sql
    }
  }

  /** Ordered ALTER plan migrating a sink table from `from` to `to`:
    * ADDs (new columns), DROPs (removed), TYPE changes (same name,
    * different dialect type) — the DDL emission a TiCDC-style sink
    * performs when the upstream schema evolves (reference README.md:63,
    * EmitDDLEvent). Schema work is inherently driver-side metadata
    * (|columns| rows, no data touched). Deterministic order:
    * op class (ADD, ALTER TYPE, DROP), then column name. */
  def ddlPlan(table: String, from: Seq[(String, String)],
              to: Seq[(String, String)]): Seq[(String, String, String, String)] = {
    val fromM = from.toMap
    val toM = to.toMap
    val adds = to.filterNot { case (n, _) => fromM.contains(n) }
      .map { case (n, t) =>
        ("ADD", n, t, s"ALTER TABLE $table ADD COLUMN $n $t") }
    val drops = from.filterNot { case (n, _) => toM.contains(n) }
      .map { case (n, t) =>
        ("DROP", n, t, s"ALTER TABLE $table DROP COLUMN $n") }
    val retypes = to.collect {
      case (n, t) if fromM.get(n).exists(_ != t) =>
        ("ALTER TYPE", n, t, s"ALTER TABLE $table ALTER COLUMN $n TYPE $t")
    }
    (adds ++ retypes ++ drops).sortBy(r => (r._1, r._2))
  }

  /** Union changefeed segments written under different schema versions
    * into one feed with the evolved schema: columns missing in older
    * segments are null-filled, then the DDL history's defaults apply. */
  def splice(segments: Seq[DataFrame], ddls: Seq[Ddl]): DataFrame = {
    val unioned = segments.reduce(_.unionByName(_, allowMissingColumns = true))
    evolve(unioned, ddls)
  }
}
