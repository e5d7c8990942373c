package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic synthetic-changelog generator — a full DataSourceV2
  * `TableProvider` with BOTH batch and micro-batch streaming reads (the
  * CDC-shaped cousin of Spark's `rate` source): rows are a pure integer
  * function of their index, generated IN THE EXECUTORS from (start, end)
  * ranges with zero I/O, so a correctness/perf harness can ask for a
  * billion change events without writing a byte, and the SAME rows come
  * back on every engine (the row function is plain integer arithmetic,
  * re-stated by the DuckDB oracle via `generate_series`).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.GenSource")
  *     .option("rows", 100000).option("slices", 32).load()
  *   spark.readStream.format("graft.sources.GenSource")
  *     .option("rowsPerBatch", 1000).load()
  * }}}
  *
  * Scale shape: `slices` input partitions each generate a disjoint
  * index range — perfectly even, no shuffle, no skew; the streaming
  * side advances a LongOffset by `rowsPerBatch` per micro-batch, so a
  * planned batch re-reads identically after restart (deterministic
  * replay — the property every exactly-once test in this repo leans
  * on).
  *
  * Row function (index i, all integer math — keep in sync with
  * [[GenSource.oracleSql]]):
  *   event_id = i
  *   user_id  = (i * 37) % users
  *   ts_us    = epoch + i * stepUs
  *   event_type = ["signup","view","click","purchase","error"][(i*13) % 5]
  *   value_e2 = (i * 7919) % 100000   (exact cents)
  */
class GenSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GenTable(new CaseInsensitiveStringMap(properties))
}

object GenSource {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("ts_us", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value_e2", LongType, nullable = false)))

  val eventTypes: Array[String] =
    Array("signup", "view", "click", "purchase", "error")

  val epochUs = 1700000000000000L
  val stepUs = 1000000L

  def userId(i: Long, users: Long): Long = (i * 37) % users
  def tsUs(i: Long): Long = epochUs + i * stepUs
  def eventType(i: Long): String = eventTypes(((i * 13) % 5).toInt)
  def valueE2(i: Long): Long = (i * 7919) % 100000

  /** The row function as a DuckDB relation over [0, rows). */
  def oracleSql(rows: Long, users: Long): String =
    s"""SELECT i AS event_id,
       |       (i * 37) % $users AS user_id,
       |       $epochUs + i * $stepUs AS ts_us,
       |       ['signup','view','click','purchase','error'][((i * 13) % 5) + 1]
       |         AS event_type,
       |       (i * 7919) % 100000 AS value_e2
       |FROM generate_series(0, ${rows - 1}) t(i)""".stripMargin
}

private[sources] class GenTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = "graft_gen"
  override def schema(): StructType = GenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    // read-path options land here (getTable's properties are the
    // table-level ones); fall back to table properties
    def opt(k: String, d: Long): Long = {
      val v = if (opts.containsKey(k)) opts.get(k)
        else if (options.containsKey(k)) options.get(k) else null
      if (v == null) d else v.toLong
    }
    new GenScanBuilder(opt("rows", 1000L), opt("users", 100L),
      opt("slices", 4L).toInt, opt("rowsPerBatch", 100L))
  }
}

private[sources] class GenScanBuilder(rows: Long, users: Long, slices: Int,
                                      rowsPerBatch: Long)
    extends ScanBuilder with Scan {

  override def build(): Scan = this
  override def readSchema(): StructType = GenSource.schema
  override def description(): String =
    s"GraftGen(rows=$rows, users=$users, slices=$slices)"

  override def toBatch: Batch = new GenBatch(0L, rows, users, slices)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenMicroBatchStream(rows, users, slices, rowsPerBatch)
}

private[sources] case class GenInputPartition(start: Long, end: Long,
                                              users: Long)
    extends InputPartition

/** Batch over index range [from, until): `slices` even sub-ranges. */
private[sources] class GenBatch(from: Long, until: Long, users: Long,
                                slices: Int) extends Batch {

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(until - from, 0L)
    val k = math.max(1, math.min(slices.toLong, math.max(n, 1L))).toInt
    (0 until k).map { s =>
      val lo = from + n * s / k
      val hi = from + n * (s + 1) / k
      GenInputPartition(lo, hi, users): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GenReaderFactory
}

private[sources] object GenReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenInputPartition]
    new PartitionReader[InternalRow] {
      private var i = gp.start - 1
      override def next(): Boolean = { i += 1; i < gp.end }
      override def get(): InternalRow =
        InternalRow(i, GenSource.userId(i, gp.users), GenSource.tsUs(i),
          UTF8String.fromString(GenSource.eventType(i)),
          GenSource.valueE2(i))
      override def close(): Unit = ()
    }
  }
}

private[sources] case class GenOffset(index: Long) extends Offset {
  override def json(): String = index.toString
}

/** Micro-batch stream: the offset IS the next row index; each planned
  * batch covers [startOffset, endOffset) and replays identically after
  * restart (pure function of the range — deterministic replay). */
private[sources] class GenMicroBatchStream(rows: Long, users: Long,
                                           slices: Int, rowsPerBatch: Long)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // Trigger.AvailableNow: the whole declared range is "available now"
  // by construction (rows are a pure function of the index), and
  // latestOffset already walks toward it one batch per poll and stops
  // advancing at the end — exactly the multi-batch drain-then-terminate
  // contract. Without this marker the engine would wrap the stream and
  // freeze availability at the FIRST poll (one batch), silently
  // truncating the feed.
  override def prepareForTriggerAvailableNow(): Unit = ()

  // each poll advances the available high-water mark by one batch — the
  // engine admits [start, latest) per trigger, so batch sizes stay
  // ≤ rowsPerBatch·polls and the mark stops at `rows` (which lets
  // processAllAvailable terminate). Checkpoint recovery lands on a
  // FRESH stream instance whose mark would restart at 0, so latestOffset
  // would regress below the committed offset and the engine would
  // commit the regressed end and re-deliver committed rows (a
  // duplicate-delivery bug the deterministic-replay contract forbids,
  // reproduced in GenSourceSpec's restart test). The stream therefore
  // implements SupportsAdmissionControl — the ONE polling hook the
  // engine hands the recovered start offset to — and seeds the mark
  // from every offset the engine passes back, keeping latestOffset
  // monotone across restarts.
  private var available = 0L

  private def seed(index: Long): Unit =
    available = math.max(available, index)

  override def initialOffset(): Offset = GenOffset(0L)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    seed(start.asInstanceOf[GenOffset].index)
    available = math.min(rows, available + rowsPerBatch)
    GenOffset(available)
  }

  override def reportLatestOffset(): Offset = GenOffset(available)

  // non-admission-control fallback (not called by the engine once
  // SupportsAdmissionControl is implemented; kept for API completeness)
  override def latestOffset(): Offset = {
    available = math.min(rows, available + rowsPerBatch)
    GenOffset(available)
  }

  override def deserializeOffset(json: String): Offset = {
    seed(json.toLong)
    GenOffset(json.toLong)
  }

  override def commit(end: Offset): Unit =
    seed(end.asInstanceOf[GenOffset].index)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    seed(end.asInstanceOf[GenOffset].index)
    new GenBatch(start.asInstanceOf[GenOffset].index,
      end.asInstanceOf[GenOffset].index, users, slices)
      .planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GenReaderFactory

  override def stop(): Unit = ()
}
