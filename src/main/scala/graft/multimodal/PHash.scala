package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Perceptual image hashing (dHash, the difference hash of
  * Krawetz's pHash family) over REAL decoded pixels — the image-side
  * twin of C3's SimHash: two images that LOOK alike hash to nearby
  * 64-bit codes however their bytes differ (re-encode, recompress),
  * so corpus-scale image dedup is hash-bucket joins, never pixel
  * comparisons.
  *
  * The hash: area-bin the decoded image onto an 8-row × 9-column
  * grayscale grid; bit (row, col) = 1 iff cell col is brighter than
  * cell col+1 — 8 gradient bits per row, 64 bits total. Everything is
  * EXACT integer arithmetic: grayscale = R+G+B (no luma floats),
  * brightness compare is the cross-product sumL·cntR > sumR·cntL
  * (never a division), empty cells (images narrower than the grid)
  * read as 0 — so the hash is a pure function of the pixel formula
  * and the DuckDB oracle re-derives it bit-for-bit. The 64 bits ship
  * as two 32-bit halves (`dhash_hi` rows 0-3, `dhash_lo` rows 4-7):
  * BIGINT-safe in both engines, no sign-bit edge at 1<<63.
  *
  * Scale shape: hashing is scan-local per image (mapPartitions through
  * the same owned-codec seam as Media.decodeFeatures); near-dup is the
  * C3 pigeonhole — 4 bands of 16 bits, candidates = pairs sharing a
  * band (any pair within hamming 6 shares one by pigeonhole over 4
  * bands), verified by exact bit_count — candidates ~ true pairs, the
  * all-pairs square never materializes. */
object PHash {

  /** dHash of one decoded PNG payload → (hi, lo) 32-bit halves. */
  def dHashPng(bytes: Array[Byte]): (Long, Long) = {
    val (w, h, raw, stride) = PngCodec.decodePixels(bytes)
    val sums = Array.ofDim[Long](8, 9)
    val cnts = Array.ofDim[Long](8, 9)
    var y = 0
    while (y < h) {
      val gy = y * 8 / h
      val base = y * stride + 1
      var x = 0
      while (x < w) {
        val gx = x * 9 / w
        val a = (raw(base + 3 * x) & 0xff) +
          (raw(base + 3 * x + 1) & 0xff) +
          (raw(base + 3 * x + 2) & 0xff)
        sums(gy)(gx) += a
        cnts(gy)(gx) += 1
        x += 1
      }
      y += 1
    }
    var hi = 0L
    var lo = 0L
    var gy = 0
    while (gy < 8) {
      var gx = 0
      while (gx < 8) {
        val bit =
          sums(gy)(gx) * cnts(gy)(gx + 1) >
            sums(gy)(gx + 1) * cnts(gy)(gx)
        if (bit) {
          if (gy < 4) hi |= 1L << (gy * 8 + gx)
          else lo |= 1L << ((gy - 4) * 8 + gx)
        }
        gx += 1
      }
      gy += 1
    }
    (hi, lo)
  }

  /** Per-image dHash over a media frame (`media_id`, `content` PNG
    * bytes): scan-local, one row per image. */
  def dHashFrame(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val (hi, lo) = dHashPng(bytes)
        (id, hi, lo)
      })
      .toDF("media_id", "dhash_hi", "dhash_lo")
  }

  private def bands(hi: Column, lo: Column): Column = array(
    hi.bitwiseAND(lit(0xffffL)),
    shiftright(hi, 16).bitwiseAND(lit(0xffffL)) + lit(0x10000L),
    lo.bitwiseAND(lit(0xffffL)) + lit(0x20000L),
    shiftright(lo, 16).bitwiseAND(lit(0xffffL)) + lit(0x30000L))

  /** Band-blocked near-dup pairs at hamming ≤ `maxHamming` (≤ 6 keeps
    * the 4×16 pigeonhole lossless: 7+ differing bits can dodge every
    * band). Band ids are offset-disambiguated so band b of one image
    * only ever meets band b of another. */
  def neardupPairs(hashes: DataFrame, maxHamming: Int = 6): DataFrame = {
    require(maxHamming <= 6,
      "4 bands of 16 bits are only lossless up to hamming 6")
    val withBands = hashes.withColumn("__band",
      explode(bands(col("dhash_hi"), col("dhash_lo"))))
    val a = withBands.select(col("media_id").as("id_a"),
      col("dhash_hi").as("hi_a"), col("dhash_lo").as("lo_a"),
      col("__band"))
    val b = withBands.select(col("media_id").as("id_b"),
      col("dhash_hi").as("hi_b"), col("dhash_lo").as("lo_b"),
      col("__band"))
    a.join(b, Seq("__band"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (expr("bit_count(hi_a ^ hi_b)") + expr("bit_count(lo_a ^ lo_b)"))
          .cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }
}
