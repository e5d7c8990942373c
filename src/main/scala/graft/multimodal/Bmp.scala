package graft.multimodal

/** A second REAL image codec behind the [[MediaCodec]] seam — 24-bit
  * uncompressed BMP (BITMAPFILEHEADER + BITMAPINFOHEADER), parsed from
  * bytes with no native libraries. Three layout properties make a lazy
  * "parser" decode the wrong pixels, and the cross-engine formula
  * oracle catches each: (a) the pixel array starts at the header's
  * `bfOffBits`, NOT at byte 54 — [[Bmp.synth]] plants a junk gap after
  * the headers; (b) rows are stored BOTTOM-UP when biHeight > 0, so
  * logical raster order requires row reversal; (c) each stored row is
  * padded to a 4-byte boundary with junk bytes a correct stride walk
  * skips.
  *
  * [[Bmp.synth]] builds valid files from a pure integer function of the
  * id (pixel value = f(id, logical raster index, channel)), so the
  * DuckDB oracle re-derives the expected features from the FORMULA in
  * logical order: a hash match proves the byte encoder and the parser
  * agree on magic, header offsets, row direction, and stride.
  * MediaSpec additionally pins rejection of malformed payloads.
  *
  * Feature extraction ([[BmpCodec.decode]]): `dim` contiguous windows
  * over the logical raster scan (window of pixel p = p·dim/(w·h)),
  * mean R+G+B intensity per window normalized to [0,1) — integer
  * window sums (order-free, exact) with ONE double division rounded to
  * float, the same engine-portable ladder [[WavCodec]] uses. */
object Bmp {

  /** Pixel width: 8..16, varies by id — odd widths exercise padding. */
  def width(id: Long): Int = (8 + id % 9).toInt

  /** Pixel height: 4..8, varies by id. */
  def height(id: Long): Int = (4 + id % 5).toInt

  /** Junk gap planted between the headers and the pixel array (0..7) —
    * only a parser that honors bfOffBits finds the pixels. */
  def gapLen(id: Long): Int = (id % 8).toInt

  /** Bytes per stored row: 3·w rounded up to a 4-byte boundary. */
  def stride(w: Int): Int = (3 * w + 3) / 4 * 4

  /** Channel value (0=B, 1=G, 2=R) of the pixel at LOGICAL raster
    * index p = y·w + x — a pure integer function both engines replay. */
  def channel(id: Long, p: Long, chan: Int): Int =
    ((id * 7 + p * 3 + chan * 11) % 256).toInt

  /** Total file size: 14 file header + 40 info header + gap + rows. */
  def fileLen(id: Long): Int =
    14 + 40 + gapLen(id) + height(id) * stride(width(id))

  private def put32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def put16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  /** A valid 24-bit BMP byte payload for `id`: BM header → info header
    * (positive biHeight → bottom-up rows) → junk gap → padded pixel
    * rows (pad bytes are nonzero junk so stride bugs change features). */
  def synth(id: Long): Array[Byte] = {
    val w = width(id)
    val h = height(id)
    val gap = gapLen(id)
    val st = stride(w)
    val offBits = 14 + 40 + gap
    val b = new Array[Byte](fileLen(id))
    b(0) = 'B'.toByte; b(1) = 'M'.toByte
    put32(b, 2, b.length)
    put32(b, 10, offBits)
    put32(b, 14, 40)                 // biSize
    put32(b, 18, w)
    put32(b, 22, h)                  // positive: bottom-up storage
    put16(b, 26, 1)                  // planes
    put16(b, 28, 24)                 // bits per pixel
    put32(b, 30, 0)                  // BI_RGB, uncompressed
    put32(b, 34, h * st)             // biSizeImage
    put32(b, 38, 2835); put32(b, 42, 2835) // 72 dpi
    var j = 0
    while (j < gap) { b(54 + j) = ((id + j) % 251).toByte; j += 1 }
    var sy = 0
    while (sy < h) {
      val y = h - 1 - sy             // stored row sy holds logical row y
      val base = offBits + sy * st
      var x = 0
      while (x < w) {
        val p = y.toLong * w + x
        b(base + 3 * x) = channel(id, p, 0).toByte
        b(base + 3 * x + 1) = channel(id, p, 1).toByte
        b(base + 3 * x + 2) = channel(id, p, 2).toByte
        x += 1
      }
      var pad = 3 * w
      while (pad < st) { b(base + pad) = 0x55.toByte; pad += 1 }
      sy += 1
    }
    b
  }
}

/** The real BMP decoder (see [[Bmp]]). Throws on malformed input —
  * upstream routes failures to the DLQ path like any codec error. */
object BmpCodec extends MediaCodec {

  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
    require(bytes.length >= 54, s"truncated BMP: ${bytes.length} bytes")
    require(bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      "not a BMP payload")
    val offBits = u32(bytes, 10)
    require(u32(bytes, 14) >= 40, "unsupported DIB header")
    val w = u32(bytes, 18)
    val hRaw = u32(bytes, 22)
    // positive biHeight = bottom-up storage; negative = top-down
    val bottomUp = hRaw > 0
    val h = math.abs(hRaw)
    require(w > 0 && h > 0, s"bad dimensions ${w}x$hRaw")
    require(u16(bytes, 26) == 1, "planes != 1")
    require(u16(bytes, 28) == 24, "not 24-bit")
    require(u32(bytes, 30) == 0, "compressed BMP unsupported")
    val st = Bmp.stride(w)
    require(offBits >= 54 && offBits.toLong + h.toLong * st <= bytes.length,
      "missing or truncated pixel array")
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    val total = w.toLong * h
    var y = 0
    while (y < h) {
      val storedRow = if (bottomUp) h - 1 - y else y
      val base = offBits + storedRow * st
      var x = 0
      while (x < w) {
        val a = (bytes(base + 3 * x) & 0xff) +
          (bytes(base + 3 * x + 1) & 0xff) +
          (bytes(base + 3 * x + 2) & 0xff)
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
