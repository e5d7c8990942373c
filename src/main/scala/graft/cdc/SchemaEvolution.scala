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
  /** Type pairs a consumer can widen through without loss — the only
    * in-place ALTERs a sink may apply blind. Everything else is graded
    * breaking (or a suspected rename, below). Shared verbatim with the
    * DuckDB mirror. */
  val wideningPairs: Seq[(String, String)] = Seq(
    ("SMALLINT", "INTEGER"), ("SMALLINT", "BIGINT"),
    ("INTEGER", "BIGINT"), ("BIGINT", "HUGEINT"),
    ("FLOAT", "DOUBLE"))

  /** A43: schema-compatibility classifier — the sink-side gate BEFORE
    * applying an upstream DDL plan (A41 emits the statements; this
    * grades whether a consumer survives them). Per changed column:
    *  - ADD → `compat_with_default` (old events surface NULL/default;
    *    existing readers ignore it) unless a column of the same type
    *    was dropped in the same transition → `suspected_rename` (both
    *    sides flagged — a rename masquerading as drop+add is the
    *    classic silent data loss in changefeed sinks);
    *  - DROP → `breaking_consumers` (any reader referencing it fails),
    *    or `suspected_rename` when a same-typed ADD exists;
    *  - type ALTER → `widening_ok` only for [[wideningPairs]];
    *    everything else `breaking_type` (narrowing, semantic change).
    * Pure metadata-scale relational logic (the frames are |schema|
    * rows), mirrored by [[compatReportSql]] over DESCRIBE. */
  def compatReport(spark: org.apache.spark.sql.SparkSession,
                   src: Seq[(String, String)],
                   tgt: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    val sdf = src.toDF("col_name", "old_type")
    val tdf = tgt.toDF("col_name", "new_type")
    val widen = wideningPairs.toDF("w_old", "w_new")
    val j = sdf.join(tdf, Seq("col_name"), "full_outer")
    val droppedTypes = j.where(col("new_type").isNull)
      .select(col("old_type").as("d_type")).distinct()
    val addedTypes = j.where(col("old_type").isNull)
      .select(col("new_type").as("a_type")).distinct()
    val adds = j.where(col("old_type").isNull)
      .join(droppedTypes, col("new_type") === col("d_type"), "left")
      .select(col("col_name"), lit("ADD").as("change"),
        lit(null).cast("string").as("old_type"), col("new_type"),
        when(col("d_type").isNotNull, "suspected_rename")
          .otherwise("compat_with_default").as("verdict"))
    val drops = j.where(col("new_type").isNull)
      .join(addedTypes, col("old_type") === col("a_type"), "left")
      .select(col("col_name"), lit("DROP").as("change"),
        col("old_type"), lit(null).cast("string").as("new_type"),
        when(col("a_type").isNotNull, "suspected_rename")
          .otherwise("breaking_consumers").as("verdict"))
    val alters = j
      .where(col("old_type").isNotNull && col("new_type").isNotNull
        && col("old_type") =!= col("new_type"))
      .join(widen, col("old_type") === col("w_old")
        && col("new_type") === col("w_new"), "left")
      .select(col("col_name"), lit("ALTER").as("change"),
        col("old_type"), col("new_type"),
        when(col("w_old").isNotNull, "widening_ok")
          .otherwise("breaking_type").as("verdict"))
    adds.unionAll(drops).unionAll(alters)
  }

  /** DuckDB mirror of [[compatReport]]: `srcRel` is a relation to
    * DESCRIBE for the source schema; `tgtCte` must define a
    * `tgt(column_name, column_type)` CTE body over `src`. */
  def compatReportSql(srcRel: String, tgtCte: String): String = {
    val widenRows = wideningPairs
      .map { case (o, n) => s"('$o', '$n')" }.mkString(", ")
    s"""WITH src AS (
       |  SELECT column_name, column_type
       |  FROM (DESCRIBE SELECT * FROM $srcRel)),
       |tgt AS ($tgtCte),
       |j AS (
       |  SELECT coalesce(s.column_name, t.column_name) AS col_name,
       |         s.column_type AS old_type, t.column_type AS new_type
       |  FROM src s FULL OUTER JOIN tgt t USING (column_name)),
       |widen AS (SELECT * FROM (VALUES $widenRows) w(w_old, w_new)),
       |dropped_types AS (
       |  SELECT DISTINCT old_type AS d_type FROM j WHERE new_type IS NULL),
       |added_types AS (
       |  SELECT DISTINCT new_type AS a_type FROM j WHERE old_type IS NULL),
       |adds AS (
       |  SELECT j.col_name, 'ADD' AS change,
       |         CAST(NULL AS VARCHAR) AS old_type, j.new_type,
       |         CASE WHEN d.d_type IS NOT NULL THEN 'suspected_rename'
       |              ELSE 'compat_with_default' END AS verdict
       |  FROM j LEFT JOIN dropped_types d ON j.new_type = d.d_type
       |  WHERE j.old_type IS NULL),
       |drops AS (
       |  SELECT j.col_name, 'DROP', j.old_type, CAST(NULL AS VARCHAR),
       |         CASE WHEN a.a_type IS NOT NULL THEN 'suspected_rename'
       |              ELSE 'breaking_consumers' END
       |  FROM j LEFT JOIN added_types a ON j.old_type = a.a_type
       |  WHERE j.new_type IS NULL),
       |alters AS (
       |  SELECT j.col_name, 'ALTER', j.old_type, j.new_type,
       |         CASE WHEN w.w_old IS NOT NULL THEN 'widening_ok'
       |              ELSE 'breaking_type' END
       |  FROM j LEFT JOIN widen w
       |    ON j.old_type = w.w_old AND j.new_type = w.w_new
       |  WHERE j.old_type IS NOT NULL AND j.new_type IS NOT NULL
       |    AND j.old_type <> j.new_type)
       |SELECT * FROM (SELECT * FROM adds UNION ALL SELECT * FROM drops
       |               UNION ALL SELECT * FROM alters)""".stripMargin
  }

  def splice(segments: Seq[DataFrame], ddls: Seq[Ddl]): DataFrame = {
    val unioned = segments.reduce(_.unionByName(_, allowMissingColumns = true))
    evolve(unioned, ddls)
  }
}
