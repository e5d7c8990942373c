package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Media

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
}
