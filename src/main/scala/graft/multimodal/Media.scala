package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.C12): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract plumbing a training-data pipeline needs.
  *
  * ALL THREE modalities' decode is REAL: [[WavCodec]] (Wav.scala) is
  * a pure-JVM RIFF/WAVE audio parser, [[BmpCodec]] (Bmp.scala) a
  * pure-JVM 24-bit BMP image parser, and [[AviCodec]] (Avi.scala) a
  * pure-JVM AVI video parser (RIFF container walk + uncompressed DIB
  * frames), each driven through this seam — see `media_wav_roundtrip`
  * / `media_bmp_roundtrip` / `media_avi_roundtrip` for the
  * cross-engine losslessness proofs. [[decodeFeatures]] defaults to a
  * deterministic byte-histogram stand-in (clearly marked below) for
  * payloads with no parser, e.g. formats needing native libraries
  * this container lacks (JPEG, H.264). Everything around the codec is
  * the
  * real production shape: binary column + metadata struct schema,
  * per-partition batched iteration (how a JNI/codec library is driven —
  * one codec init per partition, streamed records), and expression-level
  * ops (digest, header sniff, frame sampling) that stay in whole-stage
  * codegen.
  */
/** The codec seam for [[Media.decodeFeatures]]: one instance is driven
  * per partition — `open()` once (JNI library / codec-context init),
  * `decode` per record, `close()` in a finally. Implementations must be
  * serializable (they ship to executors) and deterministic per input if
  * downstream dedup relies on the features.
  *
  * The DEFAULT impl is [[ByteHistogramCodec]] — a clearly-marked
  * deterministic stand-in for formats with no pure-JVM parser here.
  * [[WavCodec]], [[BmpCodec]] and [[AviCodec]] are real drop-in
  * parsers covering all three modalities; a further decoder (JPEG →
  * pixel stats, H.264 → frame stats, …) is the same shape: implement
  * the trait, pass it to decodeFeatures; none of the Spark plumbing
  * (schema, batching, partitioning) changes. */
trait MediaCodec extends Serializable {
  /** Per-partition initialization — codec contexts, JNI handles. */
  def open(): Unit = ()
  /** Decode one payload into a `dim`-length feature vector. */
  def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float]
  /** Per-partition teardown. */
  def close(): Unit = ()
}

/** ======================= DECODE STUB =======================
  * Deterministic byte-bucket histogram standing in for a real codec —
  * the fallback for formats whose decoders need native libraries this
  * container lacks (JPEG, H.264). WAV/BMP/AVI have REAL pure-JVM
  * parsers (Wav/Bmp/Avi.scala); only this class is a fake.
  * =========================================================== */
object ByteHistogramCodec extends MediaCodec {
  def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
    val counts = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      counts(java.lang.Math.floorMod(bytes(i).toInt, dim)) += 1L
      i += 1
    }
    // normalize via DOUBLE division rounded to float — the exact chain a
    // SQL engine mirrors as CAST(c::DOUBLE / n::DOUBLE AS REAL), so the
    // stub's features are engine-portable bit-for-bit (float/float
    // division would double-round differently)
    val n = math.max(bytes.length, 1).toDouble
    val feats = new Array[Float](dim)
    var j = 0
    while (j < dim) { feats(j) = (counts(j) / n).toFloat; j += 1 }
    feats
  }
}

object Media {

  /** Typed output row of the decoder. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                           features: Array[Float])

  /** Synthesize a deterministic multimodal table from `documents`:
    * content = utf8 bytes, kind round-robins image/audio/video, metadata
    * is a typed struct (what EXIF/codec headers would populate). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      col("text").cast("binary").as("content"),
      struct(
        length(col("text")).cast("long").as("n_bytes"),
        pmod(col("doc_id") * 37, lit(1920)).cast("int").as("width"),
        pmod(col("doc_id") * 53, lit(1080)).cast("int").as("height"),
        lit(16000).as("sample_rate")).as("meta"))

  /** Content digest — dedup key for binary payloads (codegen'd). */
  def contentDigest(content: org.apache.spark.sql.Column) = sha2(content, 256)

  /** Engine-boundary form of a float32 feature vector: csv of
    * `floor(f · 2⁴⁸)` per component. The power-of-two scale is an
    * exponent shift — exact in double, no rounding anywhere — so each
    * integer captures the full float32 significand (any 1-ulp decode
    * divergence changes it), and integers stringify identically in
    * Spark and DuckDB where raw float formatting would not. This is the
    * SURVEY §6 array rule applied to float payloads: never hand the
    * driver comparator a top-level array or an engine-formatted float.
    * Features are normalized to [0, 1), so the scaled value fits a
    * BIGINT with room to spare. */
  def featuresCsv(features: Column): Column =
    concat_ws(",", transform(features,
      f => floor(f.cast("double") * lit(281474976710656L)).cast("string")))

  /** First-bytes header in hex — format sniffing (magic numbers). */
  def headerHex(content: org.apache.spark.sql.Column, n: Int = 8) =
    hex(substring(content, 1, n))

  /** Frame sampling: k evenly-strided byte slices of the payload (the
    * video-frame / audio-window sampling shape, as expressions). */
  def sampleFrames(content: org.apache.spark.sql.Column, k: Int,
                   frameLen: Int) = {
    val stride = (length(content) - frameLen) / math.max(k - 1, 1)
    array((0 until k).map(i =>
      substring(content, (lit(i) * stride + 1).cast("int"), lit(frameLen))): _*)
  }

  /** Near-duplicate media pairs over decoded feature vectors — the
    * "same asset, different encode" screen that [[contentDigest]]'s
    * exact byte dedup misses (re-encoded/transcoded payloads share
    * features, not bytes).
    *
    * Blocking is an EXACT-INTEGER grid signature, not float LSH: each
    * feature is quantized to `floor(f × 32)` (32 = 2⁵, so the multiply
    * is an exponent shift — NO floating rounding anywhere) and the dim
    * halves Horner-pack into two base-33 long band keys; a pair is
    * compared only if it shares a band. Two reasons over sign-LSH:
    * (a) decoded-feature distributions are often CONCENTRATED (all
    * byte-histograms of same-type media point the same way), which
    * collapses every sign bucket into one — the grid keys keep
    * discriminating; (b) integer keys cannot flip at a float boundary,
    * so the candidate set is bit-stable across engines — band-key
    * parity is what lets the DuckDB oracle replay the whole pipeline.
    * Recall < 1 by design (a near-dup can straddle a grid step in both
    * bands); MediaSpec measures it against the exact all-pairs
    * baseline.
    *
    * Scale shape: signatures are scan-local; candidates come from a
    * shuffle-partitioned equi-join on (band, key) — never a cartesian;
    * the threshold filter runs before the pair-dedup groupBy so only
    * surviving pairs shuffle twice. */
  def neardupPairs(feats: DataFrame, idCol: String = "media_id",
                   vecCol: String = "features", dim: Int = 16,
                   threshold: Double = 0.9995): DataFrame = {
    require(dim % 2 == 0, "grid blocking splits dims into two bands")
    val per = dim / 2
    def gridKey(offset: Int): Column =
      (0 until per).map { i =>
        val q = floor(
          element_at(col(vecCol), offset + i + 1).cast("double") * 32.0)
        q * lit(math.pow(33.0, i).toLong)
      }.reduce(_ + _).cast("long")
    val bandStructs = (0 until 2).map(b =>
      struct(lit(b).as("band"), gridKey(b * per).as("bkey")))
    val e = feats.select(col(idCol).as("id"),
        graft.functions.Vectors.toDouble(col(vecCol)).as("v"),
        explode(array(bandStructs: _*)).as("bk"))
      .select(col("id"), col("v"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .withColumn("n", graft.functions.Vectors.norm(col("v")))
    e.as("x").join(e.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        graft.functions.Vectors.cosineWithNorms(
          col("x.v"), col("y.v"), col("x.n"), col("y.n")).as("cos_raw"))
      .where(col("cos_raw") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("cos_raw")).as("cos_raw"))
      .select(col("id_a"), col("id_b"),
        round(col("cos_raw"), 4).as("cos_sim"))
  }

  /** DuckDB oracle for [[neardupPairs]] over [[fromDocuments]] media
    * decoded by the [[ByteHistogramCodec]] stub: re-derives the byte
    * histogram (ASCII corpus: char code = byte), the REAL-rounded
    * normalization, the grid band keys, candidates, and the cosine
    * threshold — the full decode → block → compare pipeline in SQL. */
  def neardupOracleSql(table: String, dim: Int = 16,
                       threshold: Double = 0.9995): String = {
    val per = dim / 2
    def keySql(lo: Int): String =
      (0 until per).map { i =>
        s"CAST(floor(CAST(vf[${lo + i + 1}] AS DOUBLE) * 32) AS BIGINT)" +
          s" * ${math.pow(33.0, i).toLong}"
      }.mkString("(", " + ", ")")
    val cos = "list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))"
    s"""WITH f AS (
       |  SELECT doc_id AS media_id,
       |    list_transform(generate_series(0, ${dim - 1}), j ->
       |      CAST(CAST(len(list_filter(chars, ch -> unicode(ch) % $dim = j))
       |             AS DOUBLE) / n AS REAL)) AS vf
       |  FROM (SELECT doc_id, string_split(text, '') AS chars,
       |          CAST(greatest(length(text), 1) AS DOUBLE) AS n
       |        FROM $table)),
       |e AS (
       |  SELECT media_id, vf::DOUBLE[] AS v,
       |    ${keySql(0)} AS k0, ${keySql(per)} AS k1
       |  FROM f),
       |bands AS (
       |  SELECT media_id, v, 0 AS band, k0 AS bkey FROM e
       |  UNION ALL SELECT media_id, v, 1, k1 FROM e),
       |cand AS (
       |  SELECT DISTINCT x.media_id AS id_a, y.media_id AS id_b
       |  FROM bands x JOIN bands y
       |    ON x.band = y.band AND x.bkey = y.bkey
       |   AND x.media_id < y.media_id)
       |SELECT id_a, id_b, round($cos, 4) AS cos_sim
       |FROM cand JOIN e a ON id_a = a.media_id
       |          JOIN e b ON id_b = b.media_id
       |WHERE $cos >= $threshold
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Batched decode / feature extraction through a [[MediaCodec]].
    *
    * The one deliberate `mapPartitions` in the library: codec libraries
    * are imperative per-record machinery with expensive init, so the
    * right Spark shape is per-partition driving — `open()` once per
    * partition, `decode` per streamed record, `close()` via a task-
    * completion listener so teardown runs even if a payload throws.
    * Default codec is the [[ByteHistogramCodec]] stub (no real codecs
    * in this container). */
  def decodeFeatures(media: DataFrame, dim: Int = 16,
                     codec: MediaCodec = ByteHistogramCodec): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        codec.open()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => codec.close()))
        it.map { case (id, kind, bytes) =>
          MediaFeatures(id, kind, bytes.length.toLong,
            codec.decode(kind, bytes, dim))
        }
      }
      .toDF()
  }
}
