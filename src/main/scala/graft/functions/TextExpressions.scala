package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-sketch kernels.
  *
  * The declarative forms (`transform(sequence(...), concat_ws)` +
  * per-element md5) run through interpreted lambda eval — measured ~1 ms
  * per document at 90 shingles, re-evaluated in every operator branch
  * that references the column. These expressions do the whole
  * tokenize→shingle→hash pipeline in one compiled pass per row (~20 µs),
  * producing EXACTLY the same values: md5 is computed over the same
  * UTF-8 bytes and the first/offset 8 hex chars are read as an unsigned
  * 32-bit value, matching `conv(substring(md5(x),1|9,8),16,10)` and the
  * DuckDB oracle's `('0x'||substr(md5(x),o,8))::BIGINT`.
  */
private[graft] object Md5Util {
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Unsigned 32-bit value of digest bytes [offset, offset+4). */
  def hash32(bytes: Array[Byte], byteOffset: Int): Long = {
    val d = digests.get()
    d.reset()
    val md = d.digest(bytes)
    ((md(byteOffset) & 0xffL) << 24) |
      ((md(byteOffset + 1) & 0xffL) << 16) |
      ((md(byteOffset + 2) & 0xffL) << 8) |
      (md(byteOffset + 3) & 0xffL)
  }
}

/** Sorted distinct hashed word n-gram shingles of a text column —
  * `array<bigint>` of unsigned 32-bit md5 prefixes. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  /** Public so generated code can call it. */
  def hashShingles(s: UTF8String): ArrayData = {
    // limit -1 mirrors Spark's split(text, " ") (keeps trailing empties)
    val tokens = s.toString.split(" ", -1)
    if (tokens.length < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](tokens.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      out(i) = Md5Util.hash32(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place dedupe of the sorted array
    var w = 0
    var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }

  override def nullSafeEval(input: Any): Any =
    hashShingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleHashes", this, classOf[ShingleHashes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.hashShingles($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** One 32-bit half of a majority-vote SimHash over an array of (distinct)
  * tokens. `byteOffset` 0 reads md5 bytes 0-3 (hex chars 1-8, the "hi"
  * half), 4 reads bytes 4-7 (hex chars 9-16, "lo"). Tie (2*ones == n)
  * sets the bit, matching the oracle's `2*len(...) >= n`. */
case class SimHashHalf(child: Expression, byteOffset: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_half"

  def simhash(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = Md5Util.hash32(arr.getUTF8String(i).getBytes, byteOffset)
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 32) {
      if (2 * counts(j) >= n) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def nullSafeEval(input: Any): Any =
    simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("simHashHalf", this, classOf[SimHashHalf].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.simhash($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashHalf =
    copy(child = newChild)
}
