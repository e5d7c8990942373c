package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Config-driven corpus curation — the docs-domain twin of the CDC
  * chain DSL (graft.cdc.ChainConfig): a curation recipe lives in job
  * config / a dataset's properties as one pipe-separated string, and
  * compiles to the SAME operators code composes by hand, fused into one
  * Catalyst plan. Changing the recipe never recompiles the pipeline.
  *
  * {{{
  *   dedup-exact | lang:en,zh | max-repetition:3/0.2
  *     | sample:en=20,zh=60,default=40 | split:train=80,valid=10,test=10
  * }}}
  *
  * Stages (docs frame must have the conventional columns doc_id / text
  * / lang / source):
  *  - `dedup-exact`                — keep the min-id representative per
  *                                   distinct content
  *  - `lang:a,b`                   — keep listed lang labels
  *  - `quality-floor:<minScore>`   — length×uniqueness heuristic ≥ min
  *  - `max-repetition:<n>/<frac>`  — duplicate n-gram fraction ≤ frac
  *  - `sample:a=20,b=60,default=40`— deterministic stratified sample on
  *                                   lang (md5-bucket, scan-local)
  *  - `split:train=80,valid=10,test=10` — adds the `split` column
  *  - `where:<sql expr>`           — arbitrary predicate
  *  - `select:a,b,c`               — projection
  *
  * Every stage is a `DataFrame => DataFrame`; the fold composes one
  * declarative plan, so Catalyst still sees through the whole recipe
  * (filters reach the scan, dedup's digest agg is the only shuffle). */
object Curation {

  /** The quality heuristic shared with `doc_budget_select` (same
    * formula, reusable from config). */
  def qualityScore(text: Column): Column = {
    val toks = Text.tokens(text)
    val n = size(toks).cast("double")
    val uniq = size(array_distinct(toks)).cast("double")
    round(least(lit(1.0), n / 100.0) * (lit(0.5) + lit(0.5) * (uniq / n)), 4)
  }

  def parse(config: String): Seq[DataFrame => DataFrame] =
    config.split('|').map(_.trim).filter(_.nonEmpty).map(parseStage).toSeq

  def run(docs: DataFrame, config: String): DataFrame =
    parse(config).foldLeft(docs)((df, stage) => stage(df))

  private def pctMap(arg: String): (Map[String, Int], Option[Int]) = {
    val kvs = arg.split(',').map(_.trim).map { s =>
      s.split("=", 2) match {
        case Array(k, v) => (k.trim, v.trim.toInt)
        case _ => throw new IllegalArgumentException(s"bad pct spec '$s'")
      }
    }
    (kvs.filterNot(_._1 == "default").toMap,
      kvs.collectFirst { case ("default", v) => v })
  }

  private def parseStage(stage: String): DataFrame => DataFrame = {
    val (kind, arg) = stage.split(":", 2) match {
      case Array(k, a) => (k.trim, a.trim)
      case Array(k) => (k.trim, "")
    }
    kind match {
      case "dedup-exact" => df => {
        val keep = Dedup.exact(df, "doc_id", "text")
          .select(col("keep_id").as("doc_id"))
        df.join(keep, "doc_id")
      }
      case "lang" =>
        val langs = arg.split(',').map(_.trim).toSet
        df => df.where(col("lang").isInCollection(langs))
      case "quality-floor" =>
        val min = arg.toDouble
        df => df.where(qualityScore(col("text")) >= min)
      case "max-repetition" =>
        val Array(n, frac) = arg.split('/')
        df => df.where(
          Text.dupNgramFrac(col("text"), n.trim.toInt) <= frac.trim.toDouble)
      case "sample" =>
        val (pct, default) = pctMap(arg)
        df => Sampling.stratifiedSample(df, "doc_id", "lang", pct,
          default.getOrElse(100))
      case "split" =>
        // order as written in the config — bucket ranges are positional
        val kvs = arg.split(',').map(_.trim).map { s =>
          s.split("=", 2) match {
            case Array(k, v) => (k.trim, v.trim.toInt)
            case _ => throw new IllegalArgumentException(s"bad split spec '$s'")
          }
        }.toSeq
        df => Sampling.assignSplit(df, "doc_id", kvs)
      case "where" => df => df.where(expr(arg))
      case "select" =>
        df => df.select(arg.split(',').map(c => col(c.trim)).toSeq: _*)
      case other =>
        throw new IllegalArgumentException(s"unknown curation stage '$other'")
    }
  }
}
