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

  /** Union changefeed segments written under different schema versions
    * into one feed with the evolved schema: columns missing in older
    * segments are null-filled, then the DDL history's defaults apply. */
  def splice(segments: Seq[DataFrame], ddls: Seq[Ddl]): DataFrame = {
    val unioned = segments.reduce(_.unionByName(_, allowMissingColumns = true))
    evolve(unioned, ddls)
  }
}
