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

/** Distinct word n-gram shingle STRINGS of a text column in one
  * compiled pass — `array<string>`, first-occurrence order. Value-equal
  * to `array_distinct(transform(sequence(0, size(t)-n), i →
  * concat_ws(' ', t[i+1..i+n])))` over `split(text, ' ')` (the
  * [[graft.operators.MinHash.shingles]] HOF chain), whose interpreted
  * per-gram lambdas measured 4.9 s WARM for the sf0.1 corpus vs ~0.5 s
  * compiled (the ShingleHashes lesson applied to the string form the
  * prefix join needs — its rarest-first ordering and its oracle are
  * defined on gram STRINGS, so the hashed form can't replace this). */
case class ShingleStrings(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_strings"

  /** Public so generated code can call it. */
  def shingleStrings(s: UTF8String): ArrayData = {
    // limit -1 mirrors Spark's split(text, " ") (keeps trailing empties)
    val tokens = s.toString.split(" ", -1)
    if (tokens.length < n)
      return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet = array_distinct's keep-first-occurrence order
    val seen = new java.util.LinkedHashSet[String](tokens.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= tokens.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var w = 0
    while (it.hasNext) { out(w) = UTF8String.fromString(it.next()); w += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    shingleStrings(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("shingleStrings", this, classOf[ShingleStrings].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $self.shingleStrings($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
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

/** Winnowing fingerprints (Schleimer et al. 2003, the MOSS scheme):
  * positional word n-gram md5-prefix hashes → minimum of every w-hash
  * window → sorted distinct minima, in one compiled pass per row.
  *
  * Replaces the declarative transform(sequence)/array_min(slice) chain,
  * whose per-gram interpreted md5 lambda measured ~7.6 s for the sf0.1
  * corpus vs ~0.4 s compiled. Bit-exact with that chain and with the
  * DuckDB list-comprehension oracle: grams are the same UTF-8 bytes,
  * the hash is the same unsigned 32-bit md5 prefix
  * (`conv(substring(md5(g),1,8),16,10)`), windows are positional.
  * Returns an empty array when there are fewer than w gram hashes
  * (callers filter those rows explicitly, mirroring the oracle's
  * WHERE). Equivalence pinned by KernelSpec. */
case class WinnowFingerprints(child: Expression, n: Int, w: Int)
    extends UnaryExpression {

  require(n >= 1 && w >= 1, "n and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_fingerprints"

  /** Public so generated code can call it. */
  def winnow(s: UTF8String): ArrayData = {
    val tokens = s.toString.split(" ", -1)
    if (tokens.length < n) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](tokens.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < h.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(tokens(i + j))
        j += 1
      }
      h(i) = Md5Util.hash32(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8), 0)
      i += 1
    }
    if (h.length < w) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](h.length - w + 1)
    var p = 0
    while (p < out.length) {
      var m = h(p)
      var j = 1
      while (j < w) {
        if (h(p + j) < m) m = h(p + j)
        j += 1
      }
      out(p) = m
      p += 1
    }
    java.util.Arrays.sort(out)
    var wr = 0
    var r = 0
    while (r < out.length) {
      if (wr == 0 || out(r) != out(wr - 1)) { out(wr) = out(r); wr += 1 }
      r += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, wr))
  }

  override def nullSafeEval(input: Any): Any =
    winnow(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("winnowFingerprints", this,
      classOf[WinnowFingerprints].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.winnow($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
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

/** Polynomial rolling hash `acc = (acc*131 + codePoint) mod 1e9+7` over a
  * string's characters, one compiled pass per row.
  *
  * Replaces the declarative `aggregate(split(text, ''), ...)` form: a
  * per-CHARACTER interpreted lambda (split allocates one UTF8String per
  * char, the fold re-enters the interpreter per step) — at 100 TB that
  * burns ~an order of magnitude of CPU for a hash a tight loop computes
  * for free. Bit-exact with the declarative form and the DuckDB oracle's
  * `list_reduce(list_transform(string_split(text, ''), ascii), ...)`:
  * both enumerate code points (Spark's `ascii` on a 1-char split element
  * IS its code point), acc stays < 2^30 so `acc*131 + cp` < 2^38 — no
  * overflow in long arithmetic. Equivalence pinned by KernelSpec. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  /** Public so generated code can call it. */
  def roll(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 131L + cp) % 1000000007L
      i += Character.charCount(cp)
    }
    acc
  }

  override def nullSafeEval(input: Any): Any =
    roll(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("rollingHash", this, classOf[RollingHash].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.roll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

/** Per-wordlist hit counts over a text column — `array<bigint>`, one
  * entry per list in `sets`, in one compiled tokenize pass per row.
  *
  * Semantics match the declarative
  * `size(filter(split(lower(text), " "), t => t.isin(set)))` per list:
  * lowercase the whole string, split on single spaces (empty tokens
  * between/after spaces count toward nothing), count EVERY occurrence
  * (not distinct). The interpreted-HOF form re-tokenizes once per
  * language per row; this does one scan with a token→set-bitmask hash
  * map lookup per token (≤64 lists). Equivalence pinned by KernelSpec. */
case class StopwordHits(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression {

  require(sets.nonEmpty && sets.length <= 64, "1..64 word lists")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_stopword_hits"

  /** token → bitmask of the lists containing it. */
  @transient private lazy val masks: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    sets.zipWithIndex.foreach { case (words, j) =>
      words.foreach { w =>
        val prev = m.get(w)
        m.put(w, (if (prev == null) 0L else prev.longValue()) | (1L << j))
      }
    }
    m
  }

  /** Public so generated code can call it. */
  def hits(s: UTF8String): ArrayData = {
    val str = s.toLowerCase.toString
    val counts = new Array[Long](sets.length)
    var start = 0
    var i = 0
    val n = str.length
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i > start) {
          val mask = masks.get(str.substring(start, i))
          if (mask != null) {
            val mv = mask.longValue()
            var j = 0
            while (j < counts.length) {
              if (((mv >>> j) & 1L) == 1L) counts(j) += 1
              j += 1
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override def nullSafeEval(input: Any): Any =
    hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("stopwordHits", this, classOf[StopwordHits].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.hits($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

/** Per-row character-distribution Shannon entropy (nats) on the e9
  * ladder: count Unicode code points, per-char contribution
  * −p·ln p rounded to 9 decimals (Spark's HALF_UP BigDecimal rule),
  * scaled ×1e9 to a long, summed as exact integers — so the value is
  * order-independent and engine-portable (the Drift/C70 recipe; max
  * entropy ln(1.1M codepoints) ≈ 14, e9 ≈ 1.4e10, far inside long).
  * The gibberish/noise detector: natural text sits in a narrow band
  * (~2.8-3.2 nats for English chars); binary-in-text, base64 blobs, and
  * key-mash rows spike high, template/repetition rows sink low.
  *
  * Scale shape: the whole histogram lives in one compiled pass per row —
  * ZERO shuffle, where the declarative form (explode chars → groupBy
  * (doc, char)) shuffles |docs|×|alphabet| rows. Equivalence with that
  * declarative form is pinned in KernelSpec; cross-engine parity with
  * the DuckDB unnest oracle is the driver row. Empty/null-safe: an
  * empty string has entropy 0. */
case class CharEntropyE9(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_entropy_e9"

  /** Public so generated code can call it. */
  def entropyE9(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return 0L
    val counts = new java.util.HashMap[Integer, Array[Int]](64)
    var total = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val slot = counts.computeIfAbsent(cp, _ => new Array[Int](1))
      slot(0) += 1
      total += 1L
      i += Character.charCount(cp)
    }
    var sumE9 = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      val p = c / total
      val term = -p * math.log(p)
      // Spark round(x, 9): BigDecimal HALF_UP — replicate exactly, then
      // the ×1e9 integer cast (fraction is ~0 after rounding, so any
      // half-rule agrees)
      val t9 = java.math.BigDecimal.valueOf(term)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      sumE9 += java.math.BigDecimal.valueOf(t9 * 1e9)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }
    sumE9
  }

  override def nullSafeEval(input: Any): Any =
    entropyE9(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("charEntropy", this, classOf[CharEntropyE9].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.entropyE9($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): CharEntropyE9 =
    copy(child = newChild)
}

/** Max whitespace-token frequency in the row (the Gopher "top-word
  * fraction" numerator): tokenize on single spaces, count occurrences
  * in a local hash map, return the largest count. Used by the C87 rule
  * filter as `top_count / n_tokens <= cap` (compared as exact integers,
  * `S * top_count <= C * n_tokens`, so no float crosses the engine
  * boundary).
  *
  * Scale shape: the whole per-doc mode lives in one compiled pass per
  * row — ZERO shuffle, where the declarative form (explode tokens →
  * groupBy (doc, token) → max) shuffles every token in the corpus.
  * Equivalence with that declarative form is pinned in KernelSpec.
  * Empty string counts one empty token (same as `string_split` /
  * Spark `split` semantics, which both yield `['']`). */
case class TopTokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_top_token_count"

  /** Public so generated code can call it. */
  def topCount(s: UTF8String): Long = {
    val str = s.toString
    val counts = new java.util.HashMap[String, Array[Int]](64)
    var best = 0
    var start = 0
    var i = 0
    val n = str.length
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        val tok = str.substring(start, i)
        val slot = counts.computeIfAbsent(tok, _ => new Array[Int](1))
        slot(0) += 1
        if (slot(0) > best) best = slot(0)
        start = i + 1
      }
      i += 1
    }
    best.toLong
  }

  override def nullSafeEval(input: Any): Any =
    topCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("topTokenCount", this, classOf[TopTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.topCount($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): TopTokenCount =
    copy(child = newChild)
}

/** Sequential greedy BPE merge passes over a token array in ONE
  * compiled pass per row — the kernel behind `Bpe.tokenize`. The
  * declarative form (one `aggregate` HOF fold per merge, each building
  * a struct(out, pending) per element) runs interpreted and was
  * measured at ~15 s for six merges over the sf0.1 corpus; this walks
  * the token array once per merge with zero allocation churn (~50×).
  * Semantics are IDENTICAL to the fold (BpeSpec pins both): per merge
  * (l, r), a greedy LEFT-TO-RIGHT non-overlapping pass — a just-merged
  * token never re-enters as the left side within the same pass. */
case class BpeMergeTokens(child: Expression,
                          merges: Seq[(String, String)], joiner: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_bpe_merge_tokens"

  // resolved once per executor, not per row
  @transient private lazy val ls = merges.map(m => UTF8String.fromString(m._1)).toArray
  @transient private lazy val rs = merges.map(m => UTF8String.fromString(m._2)).toArray
  @transient private lazy val ms = merges.map(m =>
    UTF8String.fromString(m._1 + joiner + m._2)).toArray

  /** Public so generated code can call it. */
  def mergeAll(input: ArrayData): ArrayData = {
    var cur = new Array[AnyRef](input.numElements())
    var n = cur.length
    var i = 0
    while (i < n) { cur(i) = input.getUTF8String(i); i += 1 }
    var m = 0
    while (m < ms.length) {
      val l = ls(m); val r = rs(m); val merged = ms(m)
      var w = 0
      i = 0
      while (i < n) {
        if (i + 1 < n && l == cur(i) && r == cur(i + 1)) {
          cur(w) = merged; i += 2
        } else {
          cur(w) = cur(i); i += 1
        }
        w += 1
      }
      n = w
      m += 1
    }
    if (n == cur.length) new GenericArrayData(cur)
    else new GenericArrayData(java.util.Arrays.copyOf(cur, n))
  }

  override def nullSafeEval(input: Any): Any =
    mergeAll(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeMergeTokens", this,
      classOf[BpeMergeTokens].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.mergeAll($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeMergeTokens =
    copy(child = newChild)
}
