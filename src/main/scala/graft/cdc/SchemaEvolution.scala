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

  // ---------------------------------------------------------------------
  // Mid-stream DDL (A9's streaming half): DDL events travel IN the feed
  // as op='DDL' rows whose props JSON describes the change (TiCDC's
  // EmitDDLEvent, reference README.md:63) — so schema history replays
  // with the data and a restarted consumer re-derives it.
  // ---------------------------------------------------------------------

  /** In-feed JSON form of a [[Ddl]] (AddColumn defaults are restricted
    * to string literals — the only default a schema-less JSON event can
    * carry faithfully). */
  def ddlToJson(d: Ddl): String = d match {
    case RenameColumn(from, to, ts) =>
      s"""{"ddl":"rename","from":"$from","to":"$to","ts":$ts}"""
    case AddColumn(name, _, ts) =>
      throw new IllegalArgumentException(
        s"use addColumnJson for AddColumn($name) — the Column default " +
          "must be a string literal to cross the event boundary")
    case DropColumn(name, ts) =>
      s"""{"ddl":"drop","name":"$name","ts":$ts}"""
  }

  def addColumnJson(name: String, default: String, ts: Long): String =
    s"""{"ddl":"add","name":"$name","default":"$default","ts":$ts}"""

  /** Rebuild a [[Ddl]] from the fields a DDL event carries (extracted
    * relationally with get_json_object — no driver-side JSON parsing). */
  def ddlFromFields(kind: String, a: String, b: String, ts: Long): Ddl =
    kind match {
      case "rename" => RenameColumn(a, b, ts)
      case "add" => AddColumn(a, lit(b), ts)
      case "drop" => DropColumn(a, ts)
      case other => throw new IllegalArgumentException(s"unknown DDL kind: $other")
    }

  /** Apply a DDL to a driver-side (name, dialectType) column list — the
    * metadata-only projection the streaming compat gate runs per batch
    * (schema work is |columns|-sized driver state, never a Spark job).
    * JSON-carried AddColumn defaults are string literals → VARCHAR. */
  def applyToCols(cols: Seq[(String, String)], d: Ddl): Seq[(String, String)] =
    d match {
      case AddColumn(n, _, _) =>
        if (cols.exists(_._1 == n)) cols else cols :+ (n -> "VARCHAR")
      case DropColumn(n, _) => cols.filterNot(_._1 == n)
      case RenameColumn(from, to, _) =>
        cols.map { case (n, t) => (if (n == from) to else n, t) }
    }

  /** Driver-side twin of [[compatReport]] — identical classification
    * (ADD/DROP/ALTER × default/rename/widening/breaking), pure Scala so
    * the per-micro-batch gate costs no job. compatReport stays the
    * relational form (A43's oracle speaks it); this is the same
    * decision table over the same inputs. */
  def compatVerdictsLocal(src: Seq[(String, String)],
                          tgt: Seq[(String, String)])
      : Seq[(String, String, String)] = {
    val srcM = src.toMap
    val tgtM = tgt.toMap
    val droppedTypes = src.collect {
      case (n, t) if !tgtM.contains(n) => t }.toSet
    val addedTypes = tgt.collect {
      case (n, t) if !srcM.contains(n) => t }.toSet
    val adds = tgt.filterNot { case (n, _) => srcM.contains(n) }.map {
      case (n, t) =>
        (n, "ADD",
          if (droppedTypes.contains(t)) "suspected_rename"
          else "compat_with_default")
    }
    val drops = src.filterNot { case (n, _) => tgtM.contains(n) }.map {
      case (n, t) =>
        (n, "DROP",
          if (addedTypes.contains(t)) "suspected_rename"
          else "breaking_consumers")
    }
    val alters = tgt.collect {
      case (n, t) if srcM.get(n).exists(_ != t) =>
        (n, "ALTER",
          if (wideningPairs.contains((srcM(n), t))) "widening_ok"
          else "breaking_type")
    }
    adds ++ drops ++ alters
  }

  /** [[evolve]] for MIXED-schema frames (a merged-schema read over sink
    * segments written under different points of the DDL history): a
    * rename where BOTH old and new columns exist merges them
    * (`to := coalesce(to, from)`, old segments filled from `from`)
    * instead of blindly renaming into a duplicate column. Pure
    * projection, fuses into the scan like evolve. */
  def conform(df: DataFrame, ddls: Seq[Ddl]): DataFrame =
    ddls.sortBy(_.commitTsUs).foldLeft(df) { (d, ddl) =>
      ddl match {
        case RenameColumn(from, to, _)
            if d.columns.contains(from) && d.columns.contains(to) =>
          d.withColumn(to, coalesce(col(to), col(from))).drop(from)
        case other => apply(d, other)
      }
    }
}
