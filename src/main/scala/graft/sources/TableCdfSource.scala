package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** Streaming CHANGE-DATA-FEED source over a
  * [[graft.cdc.GraftSink.VersionedTable]] (the table-side analog of
  * the A46 topic consumer; Delta's `readChangeFeed` stream): a
  * readStream that emits `changes(v-1, v)` as versions LAND — the
  * standard downstream-materialization loop (cache rebuilds, search
  * indexers, replicas) tails the table instead of re-scanning it.
  *
  * Offsets are MANIFEST VERSIONS — the manifest rename is the commit
  * point, so a version is either fully visible (its manifest lists
  * every file) or not at all: admission is naturally self-healing
  * under concurrent commits, with none of the torn-listing machinery
  * the topic source needs (reference README.md:21-26 motivates the
  * sink; the manifest chain is what makes its feed streamable).
  *
  *  - Each micro-batch reads ONLY the files its versions ADDED
  *    (manifest file-set difference — the CDF O(|changes|) law), rows
  *    tagged `_change_type='insert'` + `_commit_version`.
  *  - `#kind=optimize` versions are content-identical republishes —
  *    skipped (zero files, zero rows).
  *  - A merge/overwrite version FAILS LOUDLY: its change set is a
  *    keyed diff, not a file read — that is batch [[graft.cdc
  *    .GraftSink.VersionedTable.changes]] territory; a streaming
  *    consumer of an upsert table should read the topic feeding it.
  *  - `maxVersionsPerTrigger` bounds each micro-batch (admission
  *    control); AvailableNow freezes the end version at trigger start
  *    so the drain terminates under a live writer.
  */
class TableCdfSource extends TableProvider {

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "TableCdfSource needs an explicit schema: the table's data schema " +
        s"plus ${TableCdfSource.VersionCol} LONG and " +
        s"${TableCdfSource.ChangeTypeCol} STRING (use TableCdfSource.stream)")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new CdfTable(schema, new CaseInsensitiveStringMap(properties))
}

object TableCdfSource {
  val VersionCol = "_commit_version"
  val ChangeTypeCol = "_change_type"

  /** The readStream, assembled: `dataSchema` is the table's row shape
    * (the CDF columns are appended here). */
  def stream(spark: SparkSession, path: String, dataSchema: StructType,
             maxVersionsPerTrigger: Long = Long.MaxValue): DataFrame = {
    val schema = StructType(dataSchema.fields.toSeq :+
      StructField(ChangeTypeCol, StringType, nullable = false) :+
      StructField(VersionCol, LongType, nullable = false))
    var r = spark.readStream.format(classOf[TableCdfSource].getName)
      .schema(schema).option("path", path)
    if (maxVersionsPerTrigger != Long.MaxValue)
      r = r.option("maxVersionsPerTrigger", maxVersionsPerTrigger)
    r.load()
  }
}

private[sources] class CdfTable(schema0: StructType,
                                options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  require(options.containsKey("path"), "TableCdfSource requires option path")

  override def name(): String = s"graft_table_cdf(${options.get("path")})"
  override def schema(): StructType = schema0
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new CdfScanBuilder(schema0, opts.get("path"),
      Option(opts.get("maxVersionsPerTrigger"))
        .map(_.toLong).getOrElse(Long.MaxValue))
}

private[sources] class CdfScanBuilder(schema: StructType, path: String,
                                      maxVersionsPerTrigger: Long)
    extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = schema
  override def description(): String = s"GraftTableCdf($path)"
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new CdfMicroBatchStream(schema, path, maxVersionsPerTrigger)
}

private[sources] case class CdfOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

private[sources] case class CdfInputPartition(
    file: String, version: Long) extends InputPartition

private[sources] class CdfMicroBatchStream(schema: StructType, path: String,
                                           maxVersionsPerTrigger: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val conf: Configuration =
    SparkSession.active.sessionState.newHadoopConf()

  /** AvailableNow fixed point: the end version frozen at trigger
    * start so the drain terminates under a live writer. */
  @volatile private var fixedEnd: Option[Long] = None
  @volatile private var lastSeen: Long = 0L

  override def prepareForTriggerAvailableNow(): Unit =
    fixedEnd = Some(currentVersion())

  /** Latest PUBLISHED version — `_last_checkpoint` hint + forward
    * existence probes (the VersionedTable resolution law: the hint is
    * written after each publish, so it is never ahead, and a stale
    * hint only costs extra probes); the full `_manifests/` listing
    * survives as the hint-less fallback. The manifest rename is
    * atomic, so every version ≤ this is fully readable. */
  private def currentVersion(): Long = {
    val dir = new Path(path, "_manifests")
    val fs = dir.getFileSystem(conf)
    val hint: Long = try {
      val hp = new Path(dir, "_last_checkpoint")
      if (!fs.exists(hp)) -1L
      else {
        val in = fs.open(hp)
        val s = try scala.io.Source.fromInputStream(in, "UTF-8")
          .mkString.trim finally in.close()
        val h = s.toLong
        if (h >= 1 && fs.exists(new Path(dir, s"v$h.manifest"))) h else -1L
      }
    } catch { case _: Exception => -1L }
    val out =
      if (hint >= 0) {
        var v = hint
        while (fs.exists(new Path(dir, s"v${v + 1}.manifest"))) v += 1
        v
      }
      else if (!fs.exists(dir)) 0L
      else fs.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
        .map(_.stripPrefix("v").stripSuffix(".manifest").toLong)
        .foldLeft(0L)(math.max)
    lastSeen = out
    out
  }

  private def manifestLines(v: Long): Seq[String] = {
    val m = new Path(path, s"_manifests/v$v.manifest")
    val fs = m.getFileSystem(conf)
    require(fs.exists(m), s"$path: version $v was never committed " +
      "(or its manifest was vacuumed under this consumer)")
    val in = fs.open(m)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  private def files(v: Long): Set[String] =
    if (v == 0) Set.empty
    else manifestLines(v).filter(l => l.nonEmpty && !l.startsWith("#")).toSet

  private def kind(v: Long): Option[String] =
    manifestLines(v).find(_.startsWith("#kind="))
      .map(_.stripPrefix("#kind="))

  override def initialOffset(): Offset = CdfOffset(0L)

  override def getDefaultReadLimit: ReadLimit =
    if (maxVersionsPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxVersionsPerTrigger)

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CdfOffset].version
    val end = math.max(fixedEnd.getOrElse(currentVersion()), s)
    CdfOffset(math.min(end, s + maxVersionsPerTrigger))
  }

  override def reportLatestOffset(): Offset = CdfOffset(lastSeen)

  // not called once SupportsAdmissionControl is implemented
  override def latestOffset(): Offset =
    CdfOffset(fixedEnd.getOrElse(currentVersion()))

  override def deserializeOffset(json: String): Offset =
    CdfOffset(json.trim.toLong)

  override def commit(end: Offset): Unit = ()

  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CdfOffset].version
    val e = end.asInstanceOf[CdfOffset].version
    (s + 1 to e).flatMap { v =>
      val prev = files(v - 1)
      val cur = files(v)
      if (kind(v).contains("optimize")) Nil // content-identical
      else {
        // a deletion-vector version changes no files but DOES change
        // content — silently treating it as an empty append would
        // diverge every downstream materialization
        require(!kind(v).exists(k => k == "delete" || k == "restore"),
          s"$path: version $v is a ${kind(v).get} commit — it changes " +
            "content without adding files; a streaming CDF reads added " +
            "files only; use VersionedTable.changes for such ranges")
        require(prev.subsetOf(cur),
          s"$path: version $v is not an append (kind=${kind(v)
            .getOrElse("?")}) — a streaming CDF reads added files only; " +
            "use VersionedTable.changes for merge/overwrite ranges")
        // a line is `rel` or `rel<TAB>stats-json` (the manifest's
        // per-file footer stats); line identity is file identity —
        // strip the stats only to build the read path
        (cur -- prev).toSeq.sorted
          .map { line =>
            val i = line.indexOf('\t')
            val rel = if (i < 0) line else line.substring(0, i)
            CdfInputPartition(s"$path/$rel", v): InputPartition
          }
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdfReaderFactory(schema, new SerializableConfiguration(conf))

  override def stop(): Unit = ()
}

private[sources] class CdfReaderFactory(schema: StructType,
                                        conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new CdfPartitionReader(p.asInstanceOf[CdfInputPartition], schema,
      conf.value)
}

/** Reads one ADDED file of one version: declared columns map
  * Group → InternalRow (a column absent in the file — schema
  * evolution — reads as null); the CDF columns come from the
  * partition, not the file. */
private[sources] class CdfPartitionReader(part: CdfInputPartition,
                                          schema: StructType,
                                          conf: Configuration)
    extends PartitionReader[InternalRow] {

  private var reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(part.file))
      .withConf(conf).build()
  private var current: Group = _

  override def next(): Boolean = {
    if (reader == null) return false
    current = reader.read()
    if (current == null) { reader.close(); reader = null; false }
    else true
  }

  override def get(): InternalRow = {
    val g = current
    val t = g.getType
    InternalRow.fromSeq(schema.fields.toSeq.map { f =>
      if (f.name == TableCdfSource.VersionCol) part.version
      else if (f.name == TableCdfSource.ChangeTypeCol)
        UTF8String.fromString("insert")
      else if (!t.containsField(f.name)) null
      else {
        val i = t.getFieldIndex(f.name)
        if (g.getFieldRepetitionCount(i) == 0) null
        else f.dataType match {
          case LongType => g.getLong(i, 0)
          case IntegerType => g.getInteger(i, 0)
          case DoubleType => g.getDouble(i, 0)
          case FloatType => g.getFloat(i, 0)
          case BooleanType => g.getBoolean(i, 0)
          case StringType => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
          case dt => throw new UnsupportedOperationException(
            s"TableCdfSource: unsupported column type ${dt.simpleString}")
        }
      }
    })
  }

  override def close(): Unit =
    if (reader != null) { reader.close(); reader = null }
}
