package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.DataType

/** Zero-cost optimizer barrier: evaluates exactly as `child` but is
  * DECLARED non-deterministic, so CollapseProject will not inline it
  * into downstream consumers and PushDownPredicates will not
  * substitute it into filters. Use around an EXPENSIVE expression
  * (e.g. `from_json` of a wide schema) whose alias is referenced many
  * times downstream: without the barrier, every reference re-evaluates
  * the full expression per row — the Envelope decode measured 10-25×
  * slower from exactly this duplication (each inlined copy re-parses
  * the JSON; common-subexpression elimination does not merge copies
  * across operators).
  *
  * The non-determinism is a declaration, not a behavior — the child
  * must itself be deterministic, so plans remain replay-identical;
  * the flag only blocks the two rewrite rules that duplicate work. */
case class OptimizerBarrier(child: Expression) extends UnaryExpression {

  override lazy val deterministic: Boolean = false

  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType

  // Nondeterministic-flagged expressions must support (trivial) init.
  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OptimizerBarrier =
    copy(child = newChild)
}

object Barrier {
  /** Wrap a column in an [[OptimizerBarrier]]. */
  def once(c: Column): Column =
    GraftSqlBridge.column(OptimizerBarrier(GraftSqlBridge.expression(c)))
}
