package graft

import org.apache.spark.sql.{GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._
import graft.operators.MinHash

/** SQL-surface packaging of graft's native Catalyst kernels.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the SparkSessionExtensions route);
  *  - `GraftExtensions.register(spark)` on an existing session.
  *
  * After either, the kernels are callable from SQL:
  * {{{
  *   SELECT graft_dot(a, b), graft_shingle_hashes(text, 3) FROM t
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // GraftCatalog read substitution: SQL relations over versioned
    // tables become the native readVersion plan (vectorized scan +
    // DV anti-join + column map) — see GraftTableResolveRule
    ext.injectPostHocResolutionRule(spark =>
      graft.sources.GraftTableResolveRule(spark))
  }
}

object GraftExtensions {

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" ->
      ((args: Seq[Expression]) => DotProduct(args(0), args(1))),
    "graft_sorted_intersect_count" ->
      ((args: Seq[Expression]) => SortedIntersectCount(args(0), args(1))),
    "graft_shingle_hashes" ->
      ((args: Seq[Expression]) =>
        ShingleHashes(args(0), litInt(args(1), "shingle width"))),
    "graft_simhash_half" ->
      ((args: Seq[Expression]) =>
        SimHashHalf(args(0), litInt(args(1), "byte offset"))),
    "graft_minhash" ->
      ((args: Seq[Expression]) => MinHashArray(args(0),
        MinHash.coeffs.map(_._1), MinHash.coeffs.map(_._2), MinHash.P)),
    "graft_rolling_hash" ->
      ((args: Seq[Expression]) => RollingHash(args(0))),
    "graft_winnow" ->
      ((args: Seq[Expression]) => WinnowFingerprints(args(0),
        litInt(args(1), "gram width"), litInt(args(2), "window width"))),
    // hit counts for the built-in language wordlists, array<long> in
    // Text.stopwords order
    "graft_lang_hits" ->
      ((args: Seq[Expression]) =>
        StopwordHits(args(0), Text.stopwords.map(_._2))),
    "graft_char_entropy_e9" ->
      ((args: Seq[Expression]) => CharEntropyE9(args(0))),
    "graft_top_token_count" ->
      ((args: Seq[Expression]) => TopTokenCount(args(0))),
    // bounded per-group top-k AGGREGATE (TypedImperativeAggregate):
    // SELECT key, graft_topk(x, 5) FROM t GROUP BY key
    "graft_topk" ->
      ((args: Seq[Expression]) =>
        BoundedTopK(args(0), litInt(args(1), "k"))
          .toAggregateExpression()))

  /** Register on an already-running session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      GraftSqlBridge.registerFunction(spark, name, b)
    }
}
