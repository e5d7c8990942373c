package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** One-pass PQ encoder: all `numSub` sub-codes of a float vector in a
  * single compiled kernel. The staged declarative form builds
  * numSub·k round(9) score columns plus numSub k-deep argmax CASE
  * chains — ~256 generated expressions whose whole-stage codegen
  * COMPILE time dominates the encode at any corpus size. This kernel
  * computes the identical codes (same left-to-right dot order, same
  * BigDecimal HALF_UP round(9) snap, same leftmost-argmax rule) in one
  * tight loop; equivalence with the declarative form is pinned in
  * PqSpec, and the DuckDB oracle keeps speaking the declarative CASE
  * chains — so the kernel is pure plan mechanics, invisible to the
  * cross-engine contract. */
case class PqEncodeCodes(child: Expression,
                         books: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float>, got $other")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_pq_encode"

  @transient private lazy val norms: Array[Array[Double]] =
    books.map(_.map(_.foldLeft(0.0)((acc, x) => acc + x * x)))

  private def round9(d: Double): Double =
    java.math.BigDecimal.valueOf(d)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Public so generated code can call it. */
  def codes(arr: ArrayData): ArrayData = {
    val numSub = books.length
    val k = books(0).length
    val subDim = books(0)(0).length
    val out = new Array[Long](numSub)
    var s = 0
    while (s < numSub) {
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < k) {
        val cent = books(s)(c)
        var dot = 0.0
        var j = 0
        while (j < subDim) {
          dot += arr.getFloat(s * subDim + j).toDouble * cent(j)
          j += 1
        }
        val sc = round9(2.0 * dot - norms(s)(c))
        if (sc > bestScore) { bestScore = sc; best = c }
        c += 1
      }
      out(s) = best.toLong
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    codes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeCodes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.codes($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}
