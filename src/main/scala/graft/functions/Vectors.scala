package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<double>` embedding columns.
  *
  * The dot product is a native codegen'd Catalyst expression
  * ([[DotProduct]]) — whole-stage-codegen'd primitive loop, no boxing —
  * because the higher-order-function form (`aggregate(zip_with(...))`)
  * falls back to interpreted lambda eval and dominated the all-pairs /
  * ANN hot paths (~50× slower, measured at sf0.1).
  *
  * Engine-parity notes (SURVEY.md §6): compute in double (cast once at
  * the source), sum strictly left-to-right (same order as DuckDB's
  * `list_dot_product`), round only at the output boundary.
  */
object Vectors {

  /** array<float> → array<double>, element-wise. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Left-to-right dot product (codegen'd). */
  def dot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine from a precomputed dot and precomputed norms — lets all-pairs
    * and ANN plans compute each vector's norm ONCE instead of per pair. */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)
}
