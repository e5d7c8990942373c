package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a pre-built Bloom sketch,
  * as a native codegen expression.
  *
  * The sketch travels to executors as its serialized bytes inside the
  * expression tree (one copy per executor via the codegen reference
  * array — the same distribution path as any broadcast literal) and is
  * deserialized once per executor JVM, not per row. Probing hashes the
  * column's UTF-8 bytes with the sketch library's own hash
  * ([[BloomFilter.mightContainBinary]]), which is byte-identical to how
  * `DataFrameStatFunctions.bloomFilter` inserts string values — so a
  * sketch built by Spark's distributed partial-aggregation builder is
  * directly probe-able here.
  *
  * Why this exists (SURVEY.md §5): at 100 TB the ingested-corpus digest
  * ledger is billions of rows — far too big to broadcast — but its Bloom
  * sketch at 1% fpp is ~1.2 bytes/item, small enough to ship to every
  * executor. A scan-local `might_contain` prefilter then lets the ~99%
  * of a daily crawl batch that is genuinely new content skip the
  * digest anti-join entirely; only sketch HITS (true dupes + the fpp
  * tail) pay the shuffle. No false negatives ⇒ the final result is
  * exactly the unfiltered anti-join's.
  */
case class BloomMightContain(child: Expression, sketch: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = BloomFilter.readFrom(sketch)

  /** Public so generated code can call it. */
  def probe(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any = probe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self =
      ctx.addReferenceObj("bloomMightContain", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Column-API entry points for Bloom-sketch probes. */
object Blooms {

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** `might_contain(c)` against `bloom`. Serialized once here; every
    * probe built from the same call shares the byte array. */
  def mightContain(c: Column, bloom: BloomFilter): Column =
    mightContainBytes(c, serialize(bloom))

  /** Same, from already-serialized sketch bytes (e.g. a sketch persisted
    * alongside the corpus digest ledger and reloaded by a daily job). */
  def mightContainBytes(c: Column, sketch: Array[Byte]): Column =
    GraftSqlBridge.column(BloomMightContain(GraftSqlBridge.expression(c), sketch))
}
