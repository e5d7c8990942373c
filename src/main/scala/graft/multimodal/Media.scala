package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md §2.C12): image/audio/video payloads as
  * opaque `binary` columns with typed metadata, plus the decode /
  * feature-extract plumbing a training-data pipeline needs.
  *
  * The actual codecs are NOT available in this environment, so
  * [[decodeFeatures]] STUBS the decode step with a deterministic
  * byte-histogram "feature extractor" — clearly marked below. Everything
  * around the stub is the real production shape: binary column + metadata
  * struct schema, per-partition batched iteration (how a JNI/codec
  * library is driven — one codec init per partition, streamed records),
  * and expression-level ops (digest, header sniff, frame sampling) that
  * stay in whole-stage codegen.
  */
/** The codec seam for [[Media.decodeFeatures]]: one instance is driven
  * per partition — `open()` once (JNI library / codec-context init),
  * `decode` per record, `close()` in a finally. Implementations must be
  * serializable (they ship to executors) and deterministic per input if
  * downstream dedup relies on the features.
  *
  * The container has no real image/audio codecs, so the shipped impl is
  * [[ByteHistogramCodec]] — a clearly-marked deterministic stand-in. A
  * real decoder (JPEG → pixel stats, PCM → spectrogram, …) is a drop-in:
  * implement the trait, pass it to decodeFeatures; none of the Spark
  * plumbing (schema, batching, partitioning) changes. */
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
  * the container has no image/audio libraries. Everything around it is
  * the production shape; only this class is the fake.
  * =========================================================== */
object ByteHistogramCodec extends MediaCodec {
  def decode(kind: String, bytes: Array[Byte], dim: Int): Array[Float] = {
    val feats = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      feats(java.lang.Math.floorMod(bytes(i).toInt, dim)) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    var j = 0
    while (j < dim) { feats(j) /= n; j += 1 }
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
