package graft.multimodal

/** A REAL video codec behind the [[MediaCodec]] seam — AVI (RIFF-based,
  * like WAV) carrying uncompressed 24-bit bottom-up DIB frames (laid
  * out like BMP pixel arrays), parsed from bytes with no native
  * libraries. With [[WavCodec]] (audio) and [[BmpCodec]] (image) this
  * makes ALL THREE modalities' decode real: the container walk must
  * find `hdrl` (main + stream headers, validated), skip a planted JUNK
  * chunk, locate the `movi` LIST by its list type, and walk exactly
  * `dwTotalFrames` `00db` frame chunks whose pixel rows are stored
  * BOTTOM-UP with 4-byte stride padding — four independent layout
  * traps for a fixed-offset "parser", each caught by the formula
  * oracle.
  *
  * [[Avi.synth]] builds valid files from a pure integer function of the
  * id (pixel value = f(id, frame, logical raster index, channel)), so
  * the DuckDB oracle re-derives the expected features from the FORMULA
  * in logical (frame, raster) order. MediaSpec pins malformed-payload
  * rejection.
  *
  * Feature extraction ([[AviCodec.decode]]): `dim` contiguous windows
  * over the FRAME index (window of frame f = f·dim/nFrames, integer
  * math), mean R+G+B intensity per window normalized to [0,1) —
  * integer window sums with ONE double division rounded to float, the
  * [[WavCodec]]/[[BmpCodec]] engine-portable ladder. */
object Avi {

  /** Frame count: 8..12, varies by id. */
  def nFrames(id: Long): Int = (8 + id % 5).toInt

  /** Frame width: 6..9 — odd widths exercise row padding. */
  def width(id: Long): Int = (6 + id % 4).toInt

  /** Frame height: 4..6. */
  def height(id: Long): Int = (4 + id % 3).toInt

  /** JUNK-chunk payload length (even, 0..14), planted between `hdrl`
    * and `movi` so only a real chunk walk finds the frames. */
  def junkLen(id: Long): Int = (2 * (id % 8)).toInt

  /** Bytes per stored frame row: 3·w rounded up to 4. */
  def stride(w: Int): Int = (3 * w + 3) / 4 * 4

  /** Channel value (0=B, 1=G, 2=R) of frame `f`'s pixel at LOGICAL
    * raster index p = y·w + x — a pure integer function both engines
    * replay. */
  def channel(id: Long, f: Int, p: Long, chan: Int): Int =
    ((id * 7 + f * 131 + p * 3 + chan * 11) % 256).toInt

  /** Total file size: RIFF hdr 12 + hdrl LIST 200 + JUNK (8+junk) +
    * movi LIST 12 + nf·(8 + h·stride). */
  def fileLen(id: Long): Int =
    12 + 200 + 8 + junkLen(id) + 12 +
      nFrames(id) * (8 + height(id) * stride(width(id)))

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

  private def putTag(b: Array[Byte], off: Int, tag: String): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = tag.charAt(i).toByte; i += 1 }
  }

  /** A valid AVI byte payload for `id`: RIFF(AVI ) → LIST hdrl (avih +
    * LIST strl (strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) → JUNK →
    * LIST movi with nFrames uncompressed '00db' DIB frames (bottom-up
    * padded rows, pad bytes nonzero junk). */
  def synth(id: Long): Array[Byte] = {
    val nf = nFrames(id)
    val w = width(id)
    val h = height(id)
    val junk = junkLen(id)
    val st = stride(w)
    val frameBytes = h * st
    val b = new Array[Byte](fileLen(id))
    putTag(b, 0, "RIFF"); put32(b, 4, b.length - 8); putTag(b, 8, "AVI ")
    var off = 12
    // LIST hdrl (total 200 bytes)
    putTag(b, off, "LIST"); put32(b, off + 4, 192); putTag(b, off + 8, "hdrl")
    // avih: 8-byte chunk header + 56-byte main header
    val avih = off + 12
    putTag(b, avih, "avih"); put32(b, avih + 4, 56)
    put32(b, avih + 8, 40000)         // dwMicroSecPerFrame (25 fps)
    put32(b, avih + 8 + 16, nf)       // dwTotalFrames
    put32(b, avih + 8 + 24, 1)        // dwStreams
    put32(b, avih + 8 + 32, w)        // dwWidth
    put32(b, avih + 8 + 36, h)        // dwHeight
    // LIST strl (124 bytes): strh + strf
    val strl = avih + 64
    putTag(b, strl, "LIST"); put32(b, strl + 4, 116); putTag(b, strl + 8, "strl")
    val strh = strl + 12
    putTag(b, strh, "strh"); put32(b, strh + 4, 56)
    putTag(b, strh + 8, "vids")       // fccType
    putTag(b, strh + 12, "DIB ")      // fccHandler: uncompressed DIB
    put32(b, strh + 8 + 20, 1)        // dwScale
    put32(b, strh + 8 + 24, 25)       // dwRate
    put32(b, strh + 8 + 32, nf)       // dwLength
    val strf = strh + 64
    putTag(b, strf, "strf"); put32(b, strf + 4, 40)
    put32(b, strf + 8, 40)            // biSize
    put32(b, strf + 12, w)
    put32(b, strf + 16, h)            // positive: bottom-up frames
    put16(b, strf + 20, 1)            // planes
    put16(b, strf + 22, 24)           // bits per pixel
    put32(b, strf + 24, 0)            // BI_RGB
    put32(b, strf + 28, frameBytes)
    off += 200
    // JUNK chunk
    putTag(b, off, "JUNK"); put32(b, off + 4, junk)
    var j = 0
    while (j < junk) { b(off + 8 + j) = ((id + j) % 251).toByte; j += 1 }
    off += 8 + junk
    // LIST movi
    putTag(b, off, "LIST"); put32(b, off + 4, 4 + nf * (8 + frameBytes))
    putTag(b, off + 8, "movi")
    off += 12
    var f = 0
    while (f < nf) {
      putTag(b, off, "00db"); put32(b, off + 4, frameBytes)
      var sy = 0
      while (sy < h) {
        val y = h - 1 - sy            // stored row sy holds logical row y
        val base = off + 8 + sy * st
        var x = 0
        while (x < w) {
          val p = y.toLong * w + x
          b(base + 3 * x) = channel(id, f, p, 0).toByte
          b(base + 3 * x + 1) = channel(id, f, p, 1).toByte
          b(base + 3 * x + 2) = channel(id, f, p, 2).toByte
          x += 1
        }
        var pad = 3 * w
        while (pad < st) { b(base + pad) = 0x55.toByte; pad += 1 }
        sy += 1
      }
      off += 8 + frameBytes
      f += 1
    }
    b
  }
}

/** The real AVI decoder (see [[Avi]]). Throws on malformed input —
  * upstream routes failures to the DLQ path like any codec error. */
object AviCodec extends MediaCodec {

  private def u32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
    require(bytes.length >= 224, s"truncated AVI: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ",
      "not a RIFF/AVI payload")
    var off = 12
    var nf = -1; var w = -1; var h = -1
    var moviOff = -1; var moviEnd = -1
    while (off + 8 <= bytes.length && (nf < 0 || moviOff < 0)) {
      val t = tag(bytes, off)
      val sz = u32(bytes, off + 4)
      require(sz >= 0 && off + 8 + sz <= bytes.length,
        s"bad chunk size $sz at offset $off")
      if (t == "LIST") {
        require(sz >= 4, "LIST chunk too short for a list type")
        val lt = tag(bytes, off + 8)
        if (lt == "hdrl") {
          // walk hdrl sub-chunks: avih for dims/frames, strl for codec
          var o = off + 12
          val end = off + 8 + sz
          while (o + 8 <= end) {
            val st = tag(bytes, o)
            val ssz = u32(bytes, o + 4)
            require(ssz >= 0 && o + 8 + ssz <= end,
              s"bad hdrl sub-chunk size $ssz at offset $o")
            if (st == "avih") {
              require(ssz >= 40, "avih too short")
              nf = u32(bytes, o + 8 + 16)
              w = u32(bytes, o + 8 + 32)
              h = u32(bytes, o + 8 + 36)
            } else if (st == "LIST" && tag(bytes, o + 8) == "strl") {
              val sh = o + 12
              require(tag(bytes, sh) == "strh", "strl must begin with strh")
              require(tag(bytes, sh + 8) == "vids", "not a video stream")
              require(tag(bytes, sh + 12) == "DIB ",
                "compressed AVI unsupported")
              val sf = sh + 8 + u32(bytes, sh + 4) +
                (u32(bytes, sh + 4) & 1)
              require(tag(bytes, sf) == "strf", "missing strf")
              require(u16(bytes, sf + 22) == 24, "not 24-bit frames")
              require(u32(bytes, sf + 24) == 0, "compressed frames")
            }
            o += 8 + ssz + (ssz & 1)
          }
        } else if (lt == "movi") {
          moviOff = off + 12
          moviEnd = off + 8 + sz
        }
      }
      off += 8 + sz + (sz & 1)
    }
    require(nf > 0 && w > 0 && h > 0, "missing or empty avih header")
    require(moviOff >= 0, "missing movi list")
    val st = Avi.stride(w)
    val frameBytes = h * st
    val total = w.toLong * h
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var o = moviOff
    var f = 0
    while (f < nf) {
      require(o + 8 <= moviEnd && tag(bytes, o) == "00db",
        s"frame $f: expected a 00db chunk at offset $o")
      require(u32(bytes, o + 4) == frameBytes,
        s"frame $f: size ${u32(bytes, o + 4)} != $frameBytes")
      val win = ((f.toLong * dim) / nf).toInt.min(dim - 1)
      var y = 0
      while (y < h) {
        val base = o + 8 + (h - 1 - y) * st // bottom-up rows
        var x = 0
        while (x < w) {
          sums(win) += (bytes(base + 3 * x) & 0xff) +
            (bytes(base + 3 * x + 1) & 0xff) +
            (bytes(base + 3 * x + 2) & 0xff)
          x += 1
        }
        y += 1
      }
      counts(win) += total
      o += 8 + frameBytes
      f += 1
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
