package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-summary query routing — the read-side pair of A35's
  * incremental view maintenance: once a rollup of a fact table exists
  * (maintained by IVM or a scheduled job), aggregates over the BASE
  * table that the rollup can answer should never re-scan the base. At
  * 100 TB that is the difference between a seconds-long summary re-agg
  * and a full fact scan; classic cube/rollup servers do this routing in
  * the engine, so ours does too — as a Catalyst optimizer [[Rule]]
  * (the `SparkSessionExtensions.injectOptimizerRule` /
  * `experimentalMethods.extraOptimizations` extension point; this repo's
  * first whole-plan rewrite rule beside its expression/source/aggregate
  * extension points).
  *
  * Routing is deliberately CONSERVATIVE — a rewrite fires only when
  * every piece of the aggregate is provably answerable:
  *  - the aggregate's child is a bare scan of the registered base path
  *    (optionally through a column-pruning Project of plain attributes —
  *    no filters, no computed columns);
  *  - every grouping expression is a plain column registered as a
  *    summary grouping key (a SUBSET of the summary's keys — the rollup
  *    property: re-aggregating partials over coarser groups);
  *  - every output is either a grouping column or one of
  *    `count(*)` / `sum(col)` / `min(col)` / `max(col)` with a
  *    registered partial column, re-aggregated as sum-of-counts /
  *    sum-of-sums / min-of-mins / max-of-maxes (sums re-cast to the
  *    original result type — re-summing widened decimals must not
  *    change the query's schema).
  * Anything else — filters, expressions, distinct aggregates, other
  * aggregate functions — leaves the plan untouched and the base scan
  * answers, which is always correct.
  *
  * Output attribute ids are PRESERVED (each rewritten output keeps the
  * original `exprId`), so parents of the aggregate never notice the
  * swap. Correctness is oracle-proven by `q_summary_route` (the routed
  * result hash-matches DuckDB aggregating the base table) and
  * SummaryRoutingSpec pins both the routing (the executed plan reads
  * the summary files, not the base) and the refusals.
  */
object SummaryRouting {

  /** One registered rollup: aggregates over `baseDir` whose shape the
    * summary covers are rewritten to read `summaryDir`.
    *
    * @param keys    base grouping column → summary column holding it
    * @param aggs    (func, base column or "*" for count) → summary
    *                column holding that group's partial; func one of
    *                "count" | "sum" | "min" | "max" */
  case class Route(baseDir: String, summaryDir: String,
                   keys: Map[String, String],
                   aggs: Map[(String, String), String])

  private[plans] val routes = new ConcurrentHashMap[String, Route]()

  /** file:/a/b/, /a/b → a/b (scheme- and slash-insensitive compare). */
  private[graft] def norm(path: String): String =
    path.replaceFirst("^[a-zA-Z0-9]+:/+", "/").stripSuffix("/")

  /** Register (or replace) a route and install the rule on `spark`'s
    * optimizer if not already present. Idempotent. */
  def register(spark: SparkSession, route: Route): Unit = {
    routes.put(norm(route.baseDir), route)
    val em = spark.sessionState.experimentalMethods
    if (!em.extraOptimizations.exists(_.isInstanceOf[SummaryRoutingRule]))
      em.extraOptimizations = em.extraOptimizations :+ SummaryRoutingRule(spark)
  }

  /** Take the route offline — REQUIRED before rebuilding its summary:
    * with the route live, the summary-building aggregate (same keys,
    * same partials, bare base scan) is itself a covered shape and would
    * be rewritten to read the artifact it is about to overwrite. A
    * refresh job deregisters, rebuilds, re-registers — exactly the
    * offline window a materialized-view refresh has anyway. */
  def deregister(baseDir: String): Unit = routes.remove(norm(baseDir))

  def clear(): Unit = routes.clear()
}

case class SummaryRoutingRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import SummaryRouting._

  /** Control-flow marker: some piece of the aggregate is not covered by
    * the route — abandon the rewrite, keep the base-scan plan. */
  private object Unroutable extends Exception {
    override def fillInStackTrace(): Throwable = this
  }

  /** The registered base dir scanned by `p`, if `p` is a bare
    * (optionally column-pruned) file scan. */
  private def scannedRoute(p: LogicalPlan): Option[Route] = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scannedRoute(c)
    case l: LogicalRelation => l.relation match {
      case f: HadoopFsRelation =>
        f.location.rootPaths.toSeq match {
          case Seq(only) => Option(routes.get(norm(only.toString)))
          case _ => None
        }
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (routes.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }

  private def rewrite(agg: Aggregate): Option[Aggregate] = try {
    val route = scannedRoute(agg.child).getOrElse(throw Unroutable)
    // every grouping expression must be a registered key column
    val groupNames = agg.groupingExpressions.map {
      case a: AttributeReference if route.keys.contains(a.name) => a.name
      case _ => throw Unroutable
    }
    // fresh scan of the summary artifact (new attribute ids per rewrite)
    val summaryPlan = spark.read.parquet(route.summaryDir)
      .queryExecution.analyzed
    val sAttr = summaryPlan.output.map(a => a.name -> a).toMap
    def attr(name: String): Attribute =
      sAttr.getOrElse(name, throw Unroutable)
    def partialCol(func: String, base: String): Attribute =
      attr(route.aggs.getOrElse((func, base), throw Unroutable))
    val newRes: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if route.keys.contains(a.name) =>
        Alias(attr(route.keys(a.name)), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name)
          if route.keys.contains(a.name) =>
        Alias(attr(route.keys(a.name)), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val partial: Expression = ae.aggregateFunction match {
          case Count(Seq(Literal(_, _))) | Count(Seq()) =>
            // count(*) -> sum of partial counts, never null on a
            // non-empty group and typed back to non-nullable long
            Coalesce(Seq(
              Sum(partialCol("count", "*")).toAggregateExpression(),
              Literal(0L)))
          case Sum(c: AttributeReference, _) =>
            // re-summing a widened partial widens again; cast back so
            // the query's schema is unchanged by routing
            Cast(Sum(partialCol("sum", c.name)).toAggregateExpression(),
              al.dataType)
          case Min(c: AttributeReference) =>
            Min(partialCol("min", c.name)).toAggregateExpression()
          case Max(c: AttributeReference) =>
            Max(partialCol("max", c.name)).toAggregateExpression()
          case _ => throw Unroutable
        }
        Alias(partial, name)(exprId = al.exprId)
      case _ => throw Unroutable
    }
    val newGroup = groupNames.map(n => attr(route.keys(n)))
    logInfo(s"summary-routing: aggregate over ${route.baseDir} served " +
      s"from ${route.summaryDir}")
    Some(Aggregate(newGroup, newRes, summaryPlan))
  } catch { case Unroutable => None }
}
