package graft.multimodal

/** A REAL audio codec behind the [[MediaCodec]] seam — RIFF/WAVE with
  * 16-bit mono PCM, parsed from bytes with no native libraries (the
  * container format is simple enough for a correct pure-JVM reader).
  * This upgrades the decode story for ONE modality from the documented
  * [[ByteHistogramCodec]] stand-in to an actual container parse:
  * magic validation, chunk walking (unknown chunks skipped by their
  * declared size — fixed-offset "parsers" break on the junk chunk the
  * generator plants), fmt sanity checks, little-endian sample decode.
  *
  * [[Wav.synth]] builds VALID WAV files from a pure integer function of
  * the id, so the cross-engine oracle can re-derive the expected
  * features from the sample FORMULA: a hash match proves the byte
  * encoder and the codec's parse are mutually lossless (any offset,
  * endianness, or chunk-walk bug changes the decoded samples and the
  * features stop matching). MediaSpec additionally pins rejection of
  * malformed payloads.
  *
  * Feature extraction ([[WavCodec.decode]]): `dim` contiguous time
  * windows (window of sample t = t·dim/n, integer math), mean absolute
  * amplitude per window normalized to [0,1) — integer window sums
  * (order-free, exact) with ONE double division rounded to float, the
  * same engine-portable ladder the stub uses. */
object Wav {

  /** Samples per clip: 256..511, varies by id. */
  def nSamples(id: Long): Int = (256 + id % 256).toInt

  /** Deterministic waveform — 16-bit range [-4096, 4095]. */
  def sample(id: Long, t: Int): Int =
    ((id * 31 + t * 17) % 8192 - 4096).toInt

  /** Junk-chunk payload length (even, 0..14) — planted BEFORE the data
    * chunk so only a real chunk walk finds the samples. */
  def junkLen(id: Long): Int = (2 * (id % 8)).toInt

  /** Total file size in bytes: RIFF header 12 + junk chunk (8+junk)
    * + fmt chunk 24 + data chunk header 8 + 2·n. */
  def fileLen(id: Long): Int = 12 + 8 + junkLen(id) + 24 + 8 + 2 * nSamples(id)

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

  /** A valid RIFF/WAVE byte payload for `id`: RIFF(WAVE) → "junk"
    * chunk (codec must skip it) → canonical PCM fmt → data. */
  def synth(id: Long): Array[Byte] = {
    val n = nSamples(id)
    val junk = junkLen(id)
    val total = fileLen(id)
    val b = new Array[Byte](total)
    putTag(b, 0, "RIFF"); put32(b, 4, total - 8); putTag(b, 8, "WAVE")
    var off = 12
    putTag(b, off, "junk"); put32(b, off + 4, junk)
    var j = 0
    while (j < junk) { b(off + 8 + j) = ((id + j) % 251).toByte; j += 1 }
    off += 8 + junk
    putTag(b, off, "fmt "); put32(b, off + 4, 16)
    put16(b, off + 8, 1)            // PCM
    put16(b, off + 10, 1)           // mono
    put32(b, off + 12, 16000)       // sample rate
    put32(b, off + 16, 32000)       // byte rate
    put16(b, off + 20, 2)           // block align
    put16(b, off + 22, 16)          // bits per sample
    off += 24
    putTag(b, off, "data"); put32(b, off + 4, 2 * n)
    var t = 0
    while (t < n) { put16(b, off + 8 + 2 * t, sample(id, t) & 0xffff); t += 1 }
    b
  }
}

/** The real WAV decoder (see [[Wav]]). Throws on malformed input —
  * upstream routes failures to the DLQ path like any codec error. */
object WavCodec extends MediaCodec {

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse to raw signed 16-bit PCM samples — the shared front half
    * of [[decode]] and [[Audio.frameFeatures]]. */
  private[multimodal] def samples(bytes: Array[Byte]): Array[Int] = {
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
      "not a RIFF/WAVE payload")
    var off = 12
    var dataOff = -1
    var dataLen = -1
    var fmtOk = false
    while (off + 8 <= bytes.length && (dataOff < 0 || !fmtOk)) {
      val t = tag(bytes, off)
      val sz = u32(bytes, off + 4).toInt
      // a corrupt declared size (negative after .toInt, or past EOF)
      // must throw to the DLQ path, not stall the walk (advancing by
      // `8 + sz + (sz & 1)` with sz < 0 loops forever)
      require(sz >= 0 && off + 8 + sz <= bytes.length,
        s"bad chunk size $sz at offset $off")
      if (t == "fmt ") {
        require(u16(bytes, off + 8) == 1, "not PCM")
        require(u16(bytes, off + 10) == 1, "not mono")
        require(u16(bytes, off + 22) == 16, "not 16-bit")
        fmtOk = true
      } else if (t == "data") {
        dataOff = off + 8
        dataLen = sz
      }
      off += 8 + sz + (sz & 1) // RIFF chunks are word-aligned
    }
    require(fmtOk, "missing fmt chunk")
    require(dataOff >= 0 && dataOff + dataLen <= bytes.length,
      "missing or truncated data chunk")
    val n = dataLen / 2
    require(n > 0, "empty data chunk")
    val out = new Array[Int](n)
    var t = 0
    while (t < n) {
      // little-endian signed 16-bit
      out(t) = ((bytes(dataOff + 2 * t) & 0xff)
        | (bytes(dataOff + 2 * t + 1) << 8)).toShort.toInt
      t += 1
    }
    out
  }

  def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
    val pcm = samples(bytes)
    val n = pcm.length
    val sums = new Array[Long](dim)
    val counts = new Array[Long](dim)
    var t = 0
    while (t < n) {
      val w = (t * dim / n).min(dim - 1)
      sums(w) += math.abs(pcm(t))
      counts(w) += 1
      t += 1
    }
    val feats = new Array[Float](dim)
    var w = 0
    while (w < dim) {
      feats(w) =
        if (counts(w) == 0) 0f
        else (sums(w).toDouble / (counts(w).toDouble * 32768.0)).toFloat
      w += 1
    }
    feats
  }
}
