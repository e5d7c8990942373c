package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Scalar (per-vector max-abs) int8 embedding quantization — the
  * standard 4× compression before ANN indexing: q_i = round(x_i /
  * scale · 127) with scale = max|x_i|, reconstruction x̂_i = q_i / 127
  * · scale.
  *
  * Why it matters at 100 TB: every ANN operator here (LSH bands, IVF
  * lists, brute-force top-k) shuffles candidate vectors; float32×1024
  * rows are 4 KB each while int8 rows are 1 KB + one float scale —
  * the candidate-join exchange drops 4× with ~1e-2 cosine error. The
  * quantization itself is a scan-local projection (no shuffle, no
  * state); reconstruction error is bounded by scale/254 per element.
  *
  * Engine parity: all math in double (float inputs are exact in
  * double); `round` before the tinyint cast so both engines cast an
  * exact integer; zero vectors quantize to all-zero with scale 0. */
object Quantize {

  /** (idCol, scale, qvec tinyint[]) — the stored form. */
  def int8(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), Vectors.toDouble(col(vecCol)).as("__v"))
      .withColumn("scale", array_max(transform(col("__v"), x => abs(x))))
      .select(col(idCol), col("scale"),
        when(col("scale") === 0d,
          transform(col("__v"), _ => lit(0).cast("tinyint")))
          .otherwise(transform(col("__v"),
            x => round(x / col("scale") * 127).cast("tinyint")))
          .as("qvec"))

  /** Quantization quality report: per-vector scale, max absolute
    * reconstruction error, and the cosine between the original and the
    * reconstructed vector (1.0 = perfect). One scan-local pass. */
  def reconstructionReport(emb: DataFrame, idCol: String,
                           vecCol: String): DataFrame = {
    val q = int8(emb, idCol, vecCol)
      .join(emb.select(col(idCol), Vectors.toDouble(col(vecCol)).as("__v")),
        idCol)
    val rec = transform(col("qvec"),
      e => e.cast("double") / lit(127d) * col("scale"))
    q.select(col(idCol), col("scale"), rec.as("__r"), col("__v"))
      .select(col(idCol),
        round(col("scale"), 9).as("scale"),
        round(array_max(zip_with(col("__r"), col("__v"),
          (r, x) => abs(r - x))), 9).as("max_abs_err"),
        round(when(Vectors.norm(col("__v")) === 0d, lit(1d))
          .otherwise(Vectors.cosine(col("__r"), col("__v"))), 6)
          .as("cos_recon"))
  }

  /** DuckDB mirror of [[reconstructionReport]] (same math, same
    * rounding ladder). */
  def reconstructionReportSql(table: String, id: String,
                              vec: String): String =
    s"""WITH v AS (
       |  SELECT $id, list_transform($vec, x -> CAST(x AS DOUBLE)) AS v
       |  FROM $table),
       |s AS (
       |  SELECT $id, v, list_max(list_transform(v, x -> abs(x))) AS scale
       |  FROM v),
       |q AS (
       |  SELECT $id, v, scale,
       |    CASE WHEN scale = 0
       |      THEN list_transform(v, x -> 0.0)
       |      ELSE list_transform(v, x -> round(x / scale * 127) / 127 * scale)
       |    END AS r
       |  FROM s)
       |SELECT $id, round(scale, 9) AS scale,
       |  round(list_max([abs(r[i] - v[i])
       |                  for i in generate_series(1, len(v))]), 9)
       |    AS max_abs_err,
       |  round(CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN 1.0
       |    ELSE list_dot_product(r, v)
       |      / (sqrt(list_dot_product(r, r)) * sqrt(list_dot_product(v, v)))
       |    END, 6) AS cos_recon
       |FROM q""".stripMargin
}
