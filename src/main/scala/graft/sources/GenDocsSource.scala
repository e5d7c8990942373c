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

/** Deterministic synthetic-CORPUS generator — the documents-shaped
  * sibling of [[GenSource]]: doc rows are a pure integer function of
  * their index, generated in the executors with zero I/O, so the
  * dedup / MinHash / quality operators get the same "price a 100M-row
  * corpus without writing a byte" scale curve the changefeed snapshot
  * already has (BENCH_NOTES.md), and the SAME corpus comes back on
  * every engine (the row function is re-stated by the DuckDB oracle
  * via generate_series + list_transform).
  *
  * Row function (index i — keep in sync with [[GenDocsSource.oracleSql]]):
  *   base(i)  = i - 3 when i % 4 == 3 else i      (every 4th doc is an
  *              EXACT copy of its group leader → planted 25% dup rate,
  *              the ground truth a dedup curve needs)
  *   doc_id   = i
  *   source   = "src" + (i % 20)                  (from i, not base —
  *              duplicates cross sources)
  *   ntok(b)  = 8 + (b * 13) % 25
  *   token j  = vocab[(b / 64^j) % 64]      for j < 6 (the base-64
  *              digits of b — texts stay DISTINCT for every distinct
  *              base below 64^6 ≈ 6.9e10, so the distinct-content
  *              count tracks corpus size instead of saturating)
  *            = vocab[(b * 31 + j * 7) % 64] for j >= 6 (filler)
  *   text     = tokens joined by single spaces
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.GenDocsSource")
  *     .option("docs", 1000000).option("slices", 32).load()
  *   spark.readStream.format("graft.sources.GenDocsSource")
  *     .option("docs", 1000000).option("docsPerBatch", 100000).load()
  * }}}
  *
  * Scale shape: `slices` input partitions generate disjoint index
  * ranges — perfectly even, no shuffle, no skew; the streaming side is
  * the same admission-controlled offset walk as [[GenSource]] (restart-
  * safe, exactly-once). */
class GenDocsSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GenDocsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new GenDocsTable(new CaseInsensitiveStringMap(properties))
}

object GenDocsSource {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** 64 fixed tokens — plain common words so token counting / quality
    * heuristics see natural-looking text. Order is load-bearing (the
    * row function indexes into it); mirrored in [[vocabSqlList]]. */
  val vocab: Array[String] = Array(
    "the", "of", "and", "to", "in", "is", "you", "that", "it", "he",
    "was", "for", "on", "are", "as", "with", "his", "they", "at", "be",
    "this", "have", "from", "or", "one", "had", "by", "word", "but",
    "not", "what", "all", "were", "we", "when", "your", "can", "said",
    "there", "use", "an", "each", "which", "she", "do", "how", "their",
    "if", "will", "up", "other", "about", "out", "many", "then", "them",
    "these", "so", "some", "her", "would", "make", "like", "him")
  require(vocab.length == 64)

  def base(i: Long): Long = if (i % 4 == 3) i - 3 else i
  def source(i: Long): String = "src" + (i % 20)
  def ntok(b: Long): Int = (8 + (b * 13) % 25).toInt

  private val pow64: Array[Long] =
    Array(1L, 64L, 4096L, 262144L, 16777216L, 1073741824L)

  def text(i: Long): String = {
    val b = base(i)
    val n = ntok(b)
    val sb = new java.lang.StringBuilder(n * 6)
    var j = 0
    while (j < n) {
      if (j > 0) sb.append(' ')
      val t =
        if (j < 6) (b / pow64(j)) % 64
        else (b * 31 + j * 7) % 64
      sb.append(vocab(t.toInt))
      j += 1
    }
    sb.toString
  }

  private def vocabSqlList: String =
    vocab.map(w => s"'$w'").mkString("[", ", ", "]")

  /** The corpus as a DuckDB relation over doc_id ∈ [0, docs). */
  def oracleSql(docs: Long): String = {
    val powList = pow64.mkString("[", ", ", "]")
    s"""SELECT i AS doc_id,
       |       'src' || CAST(i % 20 AS VARCHAR) AS source,
       |       array_to_string(list_transform(range(8 + (b * 13) % 25),
       |         j -> ($vocabSqlList)[CAST(CASE WHEN j < 6
       |             THEN (b // ($powList)[CAST(j AS INTEGER) + 1]) % 64
       |             ELSE (b * 31 + j * 7) % 64 END AS INTEGER) + 1]),
       |         ' ') AS text
       |FROM (SELECT i, CASE WHEN i % 4 = 3 THEN i - 3 ELSE i END AS b
       |      FROM generate_series(0, ${docs - 1}) t(i))""".stripMargin
  }
}

private[sources] class GenDocsTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = "graft_gen_docs"
  override def schema(): StructType = GenDocsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder = {
    def opt(k: String, d: Long): Long = {
      val v = if (opts.containsKey(k)) opts.get(k)
        else if (options.containsKey(k)) options.get(k) else null
      if (v == null) d else v.toLong
    }
    new GenDocsScanBuilder(opt("docs", 1000L), opt("slices", 4L).toInt,
      opt("docsPerBatch", 100L))
  }
}

private[sources] class GenDocsScanBuilder(docs: Long, slices: Int,
                                          docsPerBatch: Long)
    extends ScanBuilder with Scan {

  override def build(): Scan = this
  override def readSchema(): StructType = GenDocsSource.schema
  override def description(): String =
    s"GraftGenDocs(docs=$docs, slices=$slices)"

  override def toBatch: Batch = new GenDocsBatch(0L, docs, slices)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GenDocsMicroBatchStream(docs, slices, docsPerBatch)
}

/** Batch over index range [from, until): `slices` even sub-ranges. */
private[sources] class GenDocsBatch(from: Long, until: Long, slices: Int)
    extends Batch {

  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(until - from, 0L)
    val k = math.max(1, math.min(slices.toLong, math.max(n, 1L))).toInt
    (0 until k).map { s =>
      val lo = from + n * s / k
      val hi = from + n * (s + 1) / k
      GenInputPartition(lo, hi, 0L): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GenDocsReaderFactory
}

private[sources] object GenDocsReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GenInputPartition]
    new PartitionReader[InternalRow] {
      private var i = gp.start - 1
      override def next(): Boolean = { i += 1; i < gp.end }
      override def get(): InternalRow =
        InternalRow(i, UTF8String.fromString(GenDocsSource.source(i)),
          UTF8String.fromString(GenDocsSource.text(i)))
      override def close(): Unit = ()
    }
  }
}

/** Micro-batch stream: same admission-controlled offset walk as
  * [[GenMicroBatchStream]] (seeded high-water mark — restart-safe). */
private[sources] class GenDocsMicroBatchStream(docs: Long, slices: Int,
                                               docsPerBatch: Long)
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

  private var available = 0L

  private def seed(index: Long): Unit =
    available = math.max(available, index)

  override def initialOffset(): Offset = GenOffset(0L)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    seed(start.asInstanceOf[GenOffset].index)
    available = math.min(docs, available + docsPerBatch)
    GenOffset(available)
  }

  override def reportLatestOffset(): Offset = GenOffset(available)

  override def latestOffset(): Offset = {
    available = math.min(docs, available + docsPerBatch)
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
    new GenDocsBatch(start.asInstanceOf[GenOffset].index,
      end.asInstanceOf[GenOffset].index, slices)
      .planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    GenDocsReaderFactory

  override def stop(): Unit = ()
}
