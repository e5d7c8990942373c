package graft

import org.apache.spark.sql.functions._

import graft.operators.Quantize

class QuantizeSpec extends SparkSpec {

  test("int8: known vector quantizes to round(x/scale*127); zero vector safe") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.int8(emb, "vec_id", "embedding")
      .select(col("vec_id"), col("scale"), col("qvec"))
      .as[(Long, Double, Seq[Byte])].collect().map(r => r._1 -> r).toMap
    assert(q(1L)._2 === 1.0)
    // -0.5 → -63.5 → half-away-from-zero → -64
    assert(q(1L)._3 === Seq[Byte](127, -64, 0))
    assert(q(2L)._2 === 0.0)
    assert(q(2L)._3 === Seq[Byte](0, 0, 0))
  }

  test("quantized ANN top-5 recalls most of the exact top-5") {
    import graft.operators.{Quantize, Similarity}
    val e = Tables.embeddings(spark, sfDir)
    val corpus = e.where(col("vec_id") >= 8)
    val probes = e.where(col("vec_id") < 8)
    val exact = Similarity.annTopK(corpus, probes, "vec_id", "embedding", 5)
      .select("probe_id", "neighbor_id")
      .withColumnRenamed("neighbor_id", "n_exact")
    val qcorpus = Quantize.int8(corpus, "vec_id", "embedding")
      .select(col("vec_id"), transform(col("qvec"),
        q => q.cast("double") / lit(127d) * col("scale")).as("embedding"))
    val quant = Similarity.annTopK(qcorpus, probes, "vec_id", "embedding", 5)
      .select("probe_id", "neighbor_id")
    val nProbes = probes.count()
    val hits = quant.join(exact,
      quant("probe_id") === exact("probe_id") &&
        quant("neighbor_id") === exact("n_exact")).count()
    // ≥ 80% of the exact top-5 survives int8 quantization
    assert(hits >= 4 * nProbes,
      s"quantized recall too low: $hits of ${5 * nProbes}")
  }

  test("reconstructionReport: error bounded by scale/254; cosine near 1 on real data") {
    val rep = Quantize.reconstructionReport(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding").cache()
    // max-abs quantization error is at most half a quantization step
    val overs = rep.where(col("max_abs_err") > col("scale") / 254 + 1e-9)
    assert(overs.count() === 0)
    val bad = rep.where(col("cos_recon") < 0.995 || col("cos_recon") > 1.000001)
    assert(bad.count() === 0, "int8 reconstruction should preserve direction")
  }
}
