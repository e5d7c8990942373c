package graft.multimodal

import java.util.zip.{CRC32, Deflater, Inflater}

/** A fourth REAL codec behind the [[MediaCodec]] seam — 24-bit
  * truecolor non-interlaced PNG, parsed from bytes with no native
  * libraries (zlib inflate ships in the JDK as
  * `java.util.zip.Inflater`). This is the first COMPRESSED format in
  * the family: where BMP/AVI trap byte-layout bugs, PNG traps the
  * decode PIPELINE — a parser that gets any stage wrong (chunk walk,
  * CRC, IDAT reassembly, inflate, per-scanline filter reversal)
  * produces wrong pixels, and the cross-engine formula oracle catches
  * it. Four planted traps:
  *
  *   (a) an ancillary `grFt` chunk sits between IHDR and IDAT — a
  *       fixed-offset reader finds junk where it expects pixel data;
  *       a chunk walk must skip it (and still verify its CRC);
  *   (b) the compressed stream is SPLIT across two IDAT chunks at an
  *       id-dependent boundary — per-chunk inflation fails; payloads
  *       must be concatenated before one inflate;
  *   (c) every scanline carries filter type `(id + y) % 5`, so all
  *       five PNG filters (None/Sub/Up/Average/Paeth) are live in
  *       every image with h ≥ 5 — a decoder skipping Paeth's
  *       tie-break rules or Average's floor division decodes wrong
  *       bytes for most rows;
  *   (d) each chunk ends in a real CRC-32 over type+data which the
  *       decoder must verify — MediaSpec pins that a flipped payload
  *       byte is rejected, not silently decoded.
  *
  * [[Png.synth]] builds valid files from the same pure integer pixel
  * function the BMP family uses (value = f(id, logical raster index,
  * channel)), so the DuckDB oracle re-derives expected features from
  * the FORMULA — it never needs to model deflate. A feature hash match
  * proves signature, chunk walk, IHDR parse, IDAT reassembly, inflate,
  * and all five filter reversals agree with the encoder.
  *
  * Feature extraction ([[PngCodec.decode]]): identical ladder to
  * [[BmpCodec]] — `dim` contiguous windows over the logical raster
  * scan, mean R+G+B per window, integer window sums with ONE double
  * division rounded to float (engine-portable bit-for-bit). */
object Png {

  /** Pixel width: 8..16, varies by id (the BMP ladder — shared oracle
    * shape). */
  def width(id: Long): Int = (8 + id % 9).toInt

  /** Pixel height: 4..8 — h ≥ 5 puts all five filters in play. */
  def height(id: Long): Int = (4 + id % 5).toInt

  /** Length of the planted ancillary chunk's junk payload (0..7). */
  def junkLen(id: Long): Int = (id % 8).toInt

  /** Channel value (storage order R,G,B = chan 0,1,2) of the pixel at
    * LOGICAL raster index p — same integer form as [[Bmp.channel]];
    * the feature sum R+G+B is channel-order-free, so BMP and PNG share
    * one oracle CTE shape. */
  def channel(id: Long, p: Long, chan: Int): Int =
    ((id * 7 + p * 3 + chan * 11) % 256).toInt

  /** TEXTURED channel formula for the perceptual-hash corpus: the p²
    * and id·p cross terms give every image its own high-frequency
    * gradient structure, so distinct ids hash far apart (the linear
    * [[channel]] ramp makes all images dHash-similar — useless for a
    * near-dup demo). Same integer-exact shape, oracle-derivable. */
  def texChannel(id: Long, p: Long, chan: Int): Int =
    ((id * 7 + p * p * 31 + id * p * 13 + chan * 11) % 256).toInt

  private val Signature =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes("US-ASCII")
    require(t.length == 4)
    val crc = new CRC32
    crc.update(t)
    crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** PNG filter application (encode side): raw scanline → filtered
    * bytes under filter `f`, given the prior row's RAW bytes. */
  private[multimodal] def applyFilter(f: Int, row: Array[Byte],
                                      prior: Array[Byte],
                                      bpp: Int): Array[Byte] = {
    val out = new Array[Byte](row.length)
    var x = 0
    while (x < row.length) {
      val r = row(x) & 0xff
      val a = if (x >= bpp) row(x - bpp) & 0xff else 0
      val b = prior(x) & 0xff
      val c = if (x >= bpp) prior(x - bpp) & 0xff else 0
      val pred = f match {
        case 0 => 0
        case 1 => a
        case 2 => b
        case 3 => (a + b) / 2
        case 4 => paeth(a, b, c)
      }
      out(x) = ((r - pred) & 0xff).toByte
      x += 1
    }
    out
  }

  /** The Paeth predictor, RFC 2083 §6.6 — ties break a, then b. */
  private[multimodal] def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** A valid 24-bit non-interlaced PNG for `id`: signature → IHDR →
    * planted ancillary `grFt` chunk → the deflated filtered scanlines
    * split across TWO IDAT chunks → IEND.
    *
    * `delta` perturbs ONLY pixel 0's R channel (mod 256) — the
    * near-duplicate knob: a nonzero delta yields an image whose dHash
    * differs from the original's in at most a couple of gradient bits
    * (the `media_phash_neardup` planting). */
  def synth(id: Long, delta: Int = 0): Array[Byte] =
    synthWith(id, delta, channel)

  /** [[synth]] over [[texChannel]] — the perceptual-hash corpus. */
  def synthTextured(id: Long, delta: Int = 0): Array[Byte] =
    synthWith(id, delta, texChannel)

  private def synthWith(id: Long, delta: Int,
                        chan: (Long, Long, Int) => Int): Array[Byte] = {
    val w = width(id); val h = height(id)
    // IHDR: w, h, bit depth 8, color type 2 (truecolor), deflate,
    // adaptive filtering, no interlace
    val ihdr = be32(w) ++ be32(h) ++
      Array[Byte](8, 2, 0, 0, 0)
    // raw filtered stream: per scanline one filter byte + filtered RGB
    val raw = new java.io.ByteArrayOutputStream()
    var prior = new Array[Byte](3 * w)
    var y = 0
    while (y < h) {
      val row = new Array[Byte](3 * w)
      var x = 0
      while (x < w) {
        val p = y.toLong * w + x
        val d = if (p == 0) delta else 0
        row(3 * x) = ((chan(id, p, 0) + d) % 256).toByte
        row(3 * x + 1) = chan(id, p, 1).toByte
        row(3 * x + 2) = chan(id, p, 2).toByte
        x += 1
      }
      val f = ((id + y) % 5).toInt
      raw.write(f)
      raw.write(applyFilter(f, row, prior, 3))
      prior = row
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw.toByteArray)
    deflater.finish()
    val comp = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!deflater.finished())
      comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val z = comp.toByteArray
    // trap (b): split the zlib stream across two IDAT chunks
    val split = math.min((id % 13 + 1).toInt, z.length)
    val junk = Array.tabulate(junkLen(id))(j => ((id + j) % 251).toByte)
    Signature ++
      chunk("IHDR", ihdr) ++
      chunk("grFt", junk) ++ // trap (a): ancillary chunk before IDAT
      chunk("IDAT", z.take(split)) ++
      chunk("IDAT", z.drop(split)) ++
      chunk("IEND", Array.emptyByteArray)
  }
}

/** The real PNG decoder (see [[Png]]). Throws on malformed input —
  * upstream routes failures to the DLQ path like any codec error. */
object PngCodec extends MediaCodec {

  private def u32be(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Parse + unfilter to raw pixels: (w, h, raw, stride) — raw holds
    * h scanlines of [filterByte, RGB×w] with filters already reversed
    * (pixel (x,y)'s R at raw(y·stride + 1 + 3x)). The shared front
    * half of [[decode]] and [[PHash.dHashPng]]. */
  private[multimodal] def decodePixels(bytes: Array[Byte])
      : (Int, Int, Array[Byte], Int) = {
    require(bytes.length >= 8, s"truncated PNG: ${bytes.length} bytes")
    require((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P'.toByte &&
      bytes(2) == 'N'.toByte && bytes(3) == 'G'.toByte,
      "not a PNG payload")
    var off = 8
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      require(off + 8 <= bytes.length, "truncated chunk header")
      val len = u32be(bytes, off)
      require(len >= 0 && off + 12L + len <= bytes.length,
        s"chunk length $len overruns payload")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      // trap (d): every chunk's CRC is verified, ancillary or not
      val crc = new CRC32
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == u32be(bytes, off + 8 + len),
        s"CRC mismatch in $typ chunk")
      typ match {
        case "IHDR" =>
          require(len == 13, "bad IHDR length")
          w = u32be(bytes, off + 8)
          h = u32be(bytes, off + 12)
          require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
          require(bytes(off + 16) == 8, "only bit depth 8 supported")
          require(bytes(off + 17) == 2, "only truecolor (type 2) supported")
          require(bytes(off + 18) == 0, "unknown compression method")
          require(bytes(off + 19) == 0, "unknown filter method")
          require(bytes(off + 20) == 0, "interlaced PNG unsupported")
        case "IDAT" =>
          require(w > 0, "IDAT before IHDR")
          idat.write(bytes, off + 8, len) // trap (b): concatenate
        case "IEND" =>
          ended = true
        case other =>
          // trap (a): unknown ANCILLARY chunks are skipped; unknown
          // CRITICAL chunks (uppercase first letter) must be refused
          require((other.charAt(0) & 0x20) != 0,
            s"unknown critical chunk $other")
      }
      off += 12 + len
    }
    require(w > 0 && idat.size() > 0, "missing IHDR or IDAT")
    // one inflate over the reassembled stream
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    val stride = 1 + 3 * w
    val rawLen = h * stride
    val raw = new Array[Byte](rawLen)
    var got = 0
    try {
      while (got < rawLen && !inflater.finished()) {
        val n = inflater.inflate(raw, got, rawLen - got)
        got += n
        // n == 0 without the finished flag covers BOTH truncation
        // (needsInput) and a preset-dictionary stream (needsDictionary)
        // — either way the walk must throw, never spin
        require(n > 0 || inflater.finished(),
          "truncated zlib stream in IDAT")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt IDAT stream: $e")
    } finally inflater.end()
    require(got == rawLen, s"inflated $got of $rawLen scanline bytes")
    // trap (c): reverse the per-scanline filter IN PLACE (prior rows
    // are already reconstructed when row y needs them)
    var y = 0
    while (y < h) {
      val f = raw(y * stride) & 0xff
      require(f <= 4, s"unknown filter type $f on scanline $y")
      val base = y * stride + 1
      val pbase = base - stride
      var x = 0
      while (x < 3 * w) {
        val a = if (x >= 3) raw(base + x - 3) & 0xff else 0
        val b = if (y > 0) raw(pbase + x) & 0xff else 0
        val c = if (y > 0 && x >= 3) raw(pbase + x - 3) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) / 2
          case 4 => Png.paeth(a, b, c)
        }
        raw(base + x) = (((raw(base + x) & 0xff) + pred) & 0xff).toByte
        x += 1
      }
      y += 1
    }
    (w, h, raw, stride)
  }

  def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
    val (w, h, raw, stride) = decodePixels(bytes)
    // the BmpCodec feature ladder: windowed integer sums, one double
    // division, round to float
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    val total = w.toLong * h
    var y = 0
    while (y < h) {
      val base = y * stride + 1
      var x = 0
      while (x < w) {
        val a = (raw(base + 3 * x) & 0xff) +
          (raw(base + 3 * x + 1) & 0xff) +
          (raw(base + 3 * x + 2) & 0xff)
        val p = y.toLong * w + x
        val win = ((p * dim) / total).toInt.min(dim - 1)
        sums(win) += a
        counts(win) += 1
        x += 1
      }
      y += 1
    }
    val feats = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      feats(i) =
        if (counts(i) == 0) 0f
        else (sums(i).toDouble / (counts(i).toDouble * 765.0)).toFloat
      i += 1
    }
    feats
  }
}
