package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{AppendData, LogicalPlan, OverwriteByExpression, OverwritePartitionsDynamic, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Post-hoc resolution rule: every READ of a [[GraftSqlTable]]
  * relation (resolved through [[GraftCatalog]]) is substituted with
  * the library's native `readVersion` plan — Spark's vectorized
  * parquet scan over the version's explicit manifest file list, with
  * the deletion vector anti-joined out and the column map projected.
  * SQL reads therefore run EXACTLY the DataFrame API's physical plan
  * (filter pushdown, column pruning, whole-stage codegen) instead of
  * a hand-rolled row-by-row DSv2 reader — the catalog resolves names
  * and versions, Catalyst plans the data movement.
  *
  * The substituted subtree re-aliases its output onto the relation's
  * attribute ids, so references above the relation bind unchanged.
  * WRITE targets (AppendData / INSERT OVERWRITE) keep the raw
  * relation — the V1 write fallback needs the [[GraftSqlTable]]
  * itself, and a write never scans through it. */
case class GraftTableResolveRule(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // write nodes reference the relation as their TARGET, not as a
    // scan — leave those instances alone (reference identity: the
    // same object appears in the write node's table slot)
    val writeTargets = plan.collect {
      case a: AppendData => a.table
      case o: OverwriteByExpression => o.table
      case d: OverwritePartitionsDynamic => d.table
    }
    plan.transformUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftSqlTable] &&
            !writeTargets.exists(_ eq r) =>
        val t = r.table.asInstanceOf[GraftSqlTable]
        val native = t.table.readVersion(spark, t.tableVersion)
          .queryExecution.analyzed
        Project(r.output.zip(native.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId)
        }, native)
    }
  }
}
