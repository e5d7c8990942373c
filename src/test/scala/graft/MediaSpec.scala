package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{ByteHistogramCodec, Media, MediaCodec}

/** Drop-in codec standing in for a real JNI decoder: constant-vector
  * features plus open/close markers so the spec can pin the per-
  * partition lifecycle. Accumulator-free: markers ride in the vector. */
object ConstantCodec extends MediaCodec {
  def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    v(0) = bytes.length.toFloat
    v(dim - 1) = if (kind == "image") 1f else 2f
    v
  }
}

class MediaSpec extends SparkSpec {

  private lazy val media = Media.fromDocuments(Tables.documents(spark, sfDir))

  test("media table has the binary + typed-metadata schema") {
    val fields = media.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("content") === "binary")
    assert(fields("meta") === "struct")
    assert(media.select("meta.n_bytes", "meta.width", "meta.height",
      "meta.sample_rate").count() === media.count())
    assert(media.where(!col("kind").isin("image", "audio", "video")).count() === 0)
  }

  test("decodeFeatures keeps one row per media with a fixed-dim vector") {
    val dim = 16
    val feats = Media.decodeFeatures(media, dim)
    assert(feats.count() === media.count())
    assert(feats.where(size(col("features")) =!= dim).count() === 0)
    // ASCII text: byte length == char length
    val joined = feats.join(media, "media_id")
      .where(col("n_bytes") =!= col("meta.n_bytes"))
    assert(joined.count() === 0)
  }

  test("stubbed decoder is deterministic across runs") {
    val a = Media.decodeFeatures(media).orderBy("media_id").collect()
    val b = Media.decodeFeatures(media).orderBy("media_id").collect()
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[scala.collection.Seq[Float]]("features").toSeq ===
        y.getAs[scala.collection.Seq[Float]]("features").toSeq)
    }
  }

  test("histogram features are normalized (sum ~= 1 for non-empty payloads)") {
    val sums = Media.decodeFeatures(media)
      .select(col("media_id"), aggregate(col("features"), lit(0.0f), _ + _).as("s"))
      .where(col("s") < 0.999f || col("s") > 1.001f)
    assert(sums.count() === 0)
  }

  test("a custom MediaCodec is a drop-in: same plumbing, different decode") {
    val dim = 4
    val feats = Media.decodeFeatures(media, dim, ConstantCodec)
    assert(feats.count() === media.count())
    assert(feats.where(size(col("features")) =!= dim).count() === 0)
    // features come from the custom codec, not the stub
    assert(feats.where(element_at(col("features"), 1) =!=
      col("n_bytes").cast("float")).count() === 0)
    assert(feats.where(col("kind") === "image"
      && element_at(col("features"), dim) =!= 1f).count() === 0)
    assert(feats.where(col("kind") =!= "image"
      && element_at(col("features"), dim) =!= 2f).count() === 0)
    // and the default is the documented stub
    assert(Media.decodeFeatures(media).exceptAll(
      Media.decodeFeatures(media, 16, ByteHistogramCodec)).count() === 0)
  }

  test("digest, header sniff and frame sampling are expression-level") {
    val out = media.select(
      col("media_id"),
      Media.contentDigest(col("content")).as("digest"),
      Media.headerHex(col("content")).as("hdr"),
      Media.sampleFrames(col("content"), k = 4, frameLen = 8).as("frames"))
    assert(out.where(length(col("digest")) =!= 64).count() === 0)
    assert(out.where(size(col("frames")) =!= 4).count() === 0)
    // header hex of ascii text: 16 hex chars for 8 bytes
    assert(out.where(length(col("hdr")) =!= 16).count() === 0)
  }

  test("feature near-dup: pairs ⊆ exact all-pairs answer, recall measured, " +
    "deterministic") {
    import graft.functions.Vectors
    val feats = Media.decodeFeatures(media, 16).cache()
    val got = Media.neardupPairs(feats).cache()
    // exact all-pairs baseline at the same threshold
    val e = feats.select(col("media_id").as("id"),
      Vectors.toDouble(col("features")).as("v"))
    val exact = e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        round(Vectors.cosine(col("x.v"), col("y.v")), 4).as("cos_sim"))
      .where(Vectors.cosine(col("x.v"), col("y.v")) >= 0.9995)
      .cache()
    // no false positives: every reported pair is a true near-dup pair
    assert(got.exceptAll(exact).count() === 0)
    // recall of the grid blocking against the exact baseline — the
    // byte-histogram distribution is grid-friendly; require most pairs
    val (nGot, nExact) = (got.count(), exact.count())
    assert(nExact > 0, "threshold found no pairs; test data changed?")
    assert(nGot * 10 >= nExact * 8, s"recall ${nGot}/${nExact} < 0.8")
    // deterministic re-run
    assert(got.exceptAll(Media.neardupPairs(feats)).count() === 0)
  }

  test("WavCodec: real RIFF parse — junk chunk walked, samples exact") {
    import graft.multimodal.{Wav, WavCodec}
    val id = 42L
    val bytes = Wav.synth(id)
    assert(bytes.length === Wav.fileLen(id))
    val feats = WavCodec.decode("audio", bytes, 8)
    // replay the windowed mean-|amplitude| directly from the formula —
    // equality proves the codec found the data chunk BEHIND the junk
    // chunk and decoded every LE16 sample exactly
    val n = Wav.nSamples(id)
    val sums = new Array[Long](8); val cnts = new Array[Long](8)
    (0 until n).foreach { t =>
      val w = t * 8 / n
      sums(w) += math.abs(Wav.sample(id, t)); cnts(w) += 1
    }
    (0 until 8).foreach { w =>
      assert(feats(w) === (sums(w).toDouble / (cnts(w).toDouble * 32768.0)).toFloat)
    }
  }

  test("WavCodec: malformed payloads are rejected, not misread") {
    import graft.multimodal.{Wav, WavCodec}
    val good = Wav.synth(7L)
    // wrong magic
    val notRiff = good.clone(); notRiff(0) = 'X'.toByte
    intercept[IllegalArgumentException](WavCodec.decode("audio", notRiff, 8))
    // truncated mid-data: data chunk length now exceeds the payload
    intercept[IllegalArgumentException](
      WavCodec.decode("audio", good.take(good.length - 10), 8))
    // stereo/compressed fmt must be refused (the codec only claims
    // 16-bit mono PCM)
    val stereo = good.clone()
    val fmtOff = 12 + 8 + Wav.junkLen(7L) // fmt chunk follows the junk chunk
    stereo(fmtOff + 10) = 2 // numChannels = 2
    intercept[IllegalArgumentException](WavCodec.decode("audio", stereo, 8))
    // corrupt declared chunk size (negative / past EOF) must throw,
    // not hang the walk loop (ADVICE r10)
    val badSz = good.clone()
    badSz(12 + 4) = 0xff.toByte; badSz(12 + 5) = 0xff.toByte
    badSz(12 + 6) = 0xff.toByte; badSz(12 + 7) = 0xff.toByte
    intercept[IllegalArgumentException](WavCodec.decode("audio", badSz, 8))
  }

  test("BmpCodec: bottom-up padded rows behind bfOffBits decoded exactly") {
    import graft.multimodal.{Bmp, BmpCodec}
    // id 3: width 11 (stride 36 ≠ 33 → padding live), gap 3 ≠ 0
    for (id <- Seq(3L, 0L, 12L)) {
      val bytes = Bmp.synth(id)
      assert(bytes.length === Bmp.fileLen(id))
      val feats = BmpCodec.decode("image", bytes, 8)
      val w = Bmp.width(id); val h = Bmp.height(id)
      val sums = new Array[Long](8); val cnts = new Array[Long](8)
      for (p <- 0L until w.toLong * h) {
        val win = (p * 8 / (w * h)).toInt
        sums(win) += (0 until 3).map(Bmp.channel(id, p, _)).sum
        cnts(win) += 1
      }
      (0 until 8).foreach { i =>
        assert(feats(i) ===
          (sums(i).toDouble / (cnts(i).toDouble * 765.0)).toFloat,
          s"id=$id window $i")
      }
    }
  }

  test("BmpCodec: a naive fixed-offset top-down read would decode wrong " +
    "pixels — the layout traps are live") {
    import graft.multimodal.Bmp
    val id = 3L // gap 3, bottom-up, stride 36 over 33 pixel bytes
    val bytes = Bmp.synth(id)
    val w = Bmp.width(id)
    // logical pixel (0,0) channel 0 lives at bfOffBits + (h-1)·stride,
    // NOT at byte 54 — both the gap and the row flip displace it
    val naive = bytes(54) & 0xff
    assert(naive !== Bmp.channel(id, 0L, 0),
      "trap dead: naive byte-54 read happened to see pixel (0,0)")
    // and the last stored row really is padded with junk
    assert(Bmp.stride(w) > 3 * w)
  }

  test("AviCodec: container walk, header parse, frames decoded exactly") {
    import graft.multimodal.{Avi, AviCodec}
    for (id <- Seq(5L, 0L, 11L)) { // width 7/6/9: padding live on 7 and 9
      val bytes = Avi.synth(id)
      assert(bytes.length === Avi.fileLen(id))
      val feats = AviCodec.decode("video", bytes, 8)
      val nf = Avi.nFrames(id); val w = Avi.width(id); val h = Avi.height(id)
      val sums = new Array[Long](8); val cnts = new Array[Long](8)
      for (f <- 0 until nf; p <- 0L until w.toLong * h) {
        val win = (f * 8 / nf).min(7)
        sums(win) += (0 until 3).map(Avi.channel(id, f, p, _)).sum
        cnts(win) += 1
      }
      (0 until 8).foreach { i =>
        assert(feats(i) ===
          (sums(i).toDouble / (cnts(i).toDouble * 765.0)).toFloat,
          s"id=$id window $i")
      }
    }
  }

  test("AviCodec: malformed payloads are rejected, not misread") {
    import graft.multimodal.{Avi, AviCodec}
    val good = Avi.synth(3L)
    val notAvi = good.clone(); notAvi(8) = 'X'.toByte // break 'AVI ' type
    intercept[IllegalArgumentException](AviCodec.decode("video", notAvi, 8))
    // truncated mid-movi: the last frame chunk runs past the payload
    intercept[IllegalArgumentException](
      AviCodec.decode("video", good.take(good.length - 10), 8))
    // compressed stream handler must be refused (codec claims DIB only)
    val cmp = good.clone()
    val strh = 12 + 12 + 64 + 12 // RIFF + LIST hdrl hdr + avih + LIST strl hdr
    cmp(strh + 12) = 'M'.toByte // fccHandler 'DIB ' -> 'MIB '
    intercept[IllegalArgumentException](AviCodec.decode("video", cmp, 8))
    // frame-count lie: avih dwTotalFrames inflated past the movi list
    val lie = good.clone()
    val avih = 12 + 12
    lie(avih + 8 + 16) = (Avi.nFrames(3L) + 3).toByte
    intercept[IllegalArgumentException](AviCodec.decode("video", lie, 8))
  }

  test("PngCodec: chunk walk, IDAT reassembly, inflate, all five " +
    "filter reversals decode exactly") {
    import graft.multimodal.{Png, PngCodec}
    // id 4: h = 8 → scanline filters (4+y)%5 cover all five types;
    // id 0: split point 1 (degenerate 1-byte first IDAT); id 12: junk 4
    for (id <- Seq(4L, 0L, 12L, 7L)) {
      val bytes = Png.synth(id)
      val feats = PngCodec.decode("image", bytes, 8)
      val w = Png.width(id); val h = Png.height(id)
      val sums = new Array[Long](8); val cnts = new Array[Long](8)
      for (p <- 0L until w.toLong * h) {
        val win = (p * 8 / (w * h)).toInt
        sums(win) += (0 until 3).map(Png.channel(id, p, _)).sum
        cnts(win) += 1
      }
      (0 until 8).foreach { i =>
        assert(feats(i) ===
          (sums(i).toDouble / (cnts(i).toDouble * 765.0)).toFloat,
          s"id=$id window $i")
      }
    }
  }

  test("PngCodec: malformed payloads are rejected, not misread") {
    import graft.multimodal.{Png, PngCodec}
    val good = Png.synth(9L)
    // broken signature
    val notPng = good.clone(); notPng(0) = 'X'.toByte
    intercept[IllegalArgumentException](PngCodec.decode("image", notPng, 8))
    // trap (d): a flipped byte inside the first IDAT payload breaks
    // that chunk's CRC — must throw, not decode garbage. IHDR chunk is
    // 12+13 bytes, grFt is 12+junkLen(9)=12+1; first IDAT data starts
    // at 8 + 25 + 13 + 8.
    val flip = good.clone(); flip(8 + 25 + 13 + 8) = (flip(54) ^ 0x40).toByte
    intercept[IllegalArgumentException](PngCodec.decode("image", flip, 8))
    // truncation mid-IDAT
    intercept[IllegalArgumentException](
      PngCodec.decode("image", good.take(good.length - 16), 8))
    // an unknown CRITICAL chunk must be refused, not skipped: rewrite
    // the ancillary grFt type to GrFt (uppercase = critical) with a
    // recomputed CRC so only the criticality bit distinguishes it
    val crit = good.clone()
    crit(8 + 25 + 4) = 'G'.toByte
    val crc = new java.util.zip.CRC32
    crc.update(crit, 8 + 25 + 4, 4 + 1) // type + 1 junk byte (id 9)
    val cv = crc.getValue.toInt
    crit(8 + 25 + 8 + 1) = ((cv >> 24) & 0xff).toByte
    crit(8 + 25 + 8 + 2) = ((cv >> 16) & 0xff).toByte
    crit(8 + 25 + 8 + 3) = ((cv >> 8) & 0xff).toByte
    crit(8 + 25 + 8 + 4) = (cv & 0xff).toByte
    intercept[IllegalArgumentException](PngCodec.decode("image", crit, 8))
  }

  test("PngCodec: the filter and split traps are live — every image " +
    "with h >= 5 uses all five filters and two IDAT chunks") {
    import graft.multimodal.Png
    val id = 4L // h = 8
    assert((0 until Png.height(id)).map(y => ((id + y) % 5).toInt)
      .toSet === Set(0, 1, 2, 3, 4))
    // the zlib stream really is split: count IDAT type markers
    val bytes = Png.synth(id)
    val s = new String(bytes.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    assert("IDAT".r.findAllIn(s).length === 2)
  }

  test("PHash: banded near-dup == brute-force pairs at hamming ≤ 6 " +
    "(the 4×16 pigeonhole is lossless), planted perturbations surface") {
    import spark.implicits._
    import graft.multimodal.{PHash, Png}
    val media = spark.range(0, 120).as[Long]
      .map(id => (id, Png.synthTextured(id)))
      .union(spark.range(0, 120).as[Long].filter(_ % 10 == 0)
        .map(id => (id + 100000L, Png.synthTextured(id, delta = 120))))
      .toDF("media_id", "content")
    val hashes = PHash.dHashFrame(media)
    val rows = hashes.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute-force ground truth
    val brute = (for {
      (ia, ha, la) <- rows; (ib, hb, lb) <- rows if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 6
    } yield (ia, ib, d.toLong)).toSet
    val banded = PHash.neardupPairs(hashes, maxHamming = 6).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute)
    // every planted (id, id+100000) pair is found, at distance ≤ 1
    val planted = banded.filter(p => p._2 == p._1 + 100000L)
    assert(planted.size === 12)
    assert(planted.forall(_._3 <= 1L))
    // the hash is a pure function of pixels: re-synthesis re-hashes
    val (h1, l1) = PHash.dHashPng(Png.synthTextured(37L))
    val (h2, l2) = PHash.dHashPng(Png.synthTextured(37L))
    assert((h1, l1) === (h2, l2))
    // a threshold past the pigeonhole guarantee is refused loudly
    intercept[IllegalArgumentException](
      PHash.neardupPairs(hashes, maxHamming = 7))
  }

  test("BmpCodec: malformed payloads are rejected, not misread") {
    import graft.multimodal.{Bmp, BmpCodec}
    val good = Bmp.synth(9L)
    val notBmp = good.clone(); notBmp(0) = 'X'.toByte
    intercept[IllegalArgumentException](BmpCodec.decode("image", notBmp, 8))
    // truncated pixel array
    intercept[IllegalArgumentException](
      BmpCodec.decode("image", good.take(good.length - 4), 8))
    // 8-bit palette BMPs are refused (codec only claims 24-bit BI_RGB)
    val pal = good.clone(); pal(28) = 8
    intercept[IllegalArgumentException](BmpCodec.decode("image", pal, 8))
    // compression flag
    val rle = good.clone(); rle(30) = 1
    intercept[IllegalArgumentException](BmpCodec.decode("image", rle, 8))
  }
}
