package graft.multimodal

import org.apache.spark.sql.DataFrame

/** Frame-level audio analysis over REAL decoded PCM — the feature
  * extraction an audio-curation pipeline runs before filtering or
  * embedding (silence trimming, clipping detection, speech/music
  * screens all start from per-frame energy + zero-crossing rate).
  *
  * Everything is EXACT integer arithmetic on the decoded samples
  * (energy as Σ|s|, no floats; zero crossings on the sign bit with
  * frame-local predecessors), so the features are a pure function of
  * the synthesized sample formula and the DuckDB oracle re-derives
  * them sample-for-sample — the same formula-oracle discipline as the
  * WAV roundtrip.
  *
  * Scale shape: one scan-local pass per payload through the owned
  * mapPartitions seam (the Media.decodeFeatures pattern); each audio
  * file emits |samples|/frameSize rows — the explode happens AFTER
  * the per-payload decode, never materializing samples as rows. */
object Audio {

  /** One frame's features: exact integer energy and crossing counts. */
  final case class Frame(media_id: Long, frame: Long, n_samples: Long,
                         sum_abs: Long, n_zero_cross: Long)

  /** Per-frame features over a media frame (`media_id`, `content` WAV
    * bytes): tumbling `frameSize`-sample frames, last frame partial.
    * Zero crossings count sign flips (s < 0 vs s >= 0) between
    * CONSECUTIVE samples within the frame — the first sample of each
    * frame has no predecessor, so frames are independent (exactly
    * re-computable from any frame boundary, the property a chunked
    * re-process needs). */
  def frameFeatures(media: DataFrame, frameSize: Int): DataFrame = {
    require(frameSize >= 2, "a frame needs at least two samples")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "content")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val pcm = WavCodec.samples(bytes)
        (0 until (pcm.length + frameSize - 1) / frameSize).map { f =>
          val lo = f * frameSize
          val hi = math.min(lo + frameSize, pcm.length)
          var sumAbs = 0L
          var zc = 0L
          var t = lo
          while (t < hi) {
            sumAbs += math.abs(pcm(t))
            if (t > lo && (pcm(t) < 0) != (pcm(t - 1) < 0)) zc += 1
            t += 1
          }
          Frame(id, f.toLong, (hi - lo).toLong, sumAbs, zc)
        }
      }
      .toDF()
  }
}
