package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * Catalyst higher-order functions (`zip_with` + `aggregate`) — fully
  * codegen'd, no UDFs, so the expressions inline into whole-stage codegen
  * and survive column pruning / predicate pushdown around them.
  *
  * Engine-parity notes (SURVEY.md §6): compute in double (cast once at the
  * source), fold left-to-right (both Spark's `aggregate` and DuckDB's
  * list ops reduce sequentially), round only at the output boundary.
  */
object Vectors {

  /** array<float> → array<double>, element-wise. */
  def toDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Left-to-right fold of the element-wise product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
