package graft.cdc

import org.apache.spark.sql.SaveMode

/** Config-driven sink targets (reference README.md:19-26 — TiCDC users
  * pick the sink with a URI, `kafka://…` / `mysql://…`; the plugin RFC
  * keeps that surface). Spark-first, the URI compiles to a [[GraftSink]]
  * so a whole delivery — chain DSL + sink URI — can live in job config:
  *
  * {{{
  *   parquet:/out/events?partitionBy=__partition&maxRecords=100000
  *   json:/out/events?mode=append
  *   topic:/out/topic?partitions=8&strategy=keyhash
  *   batched:/out/warehouse?windowUs=3600000000
  *   memory:events_view
  *   console:20
  * }}}
  *
  * Formats `parquet` / `json` / `csv` map to [[GraftSink.Files]];
  * `topic` to [[GraftSink.Topic]]; `batched` to the idempotent
  * commit-window writer [[GraftSink.Batched]] (parquet inner).
  */
object SinkConfig {

  def parse(uri: String): GraftSink = {
    val (scheme, rest) = uri.split(":", 2) match {
      case Array(s, r) => (s.trim, r.trim)
      case _ => throw new IllegalArgumentException(
        s"sink uri needs '<scheme>:<target>', got '$uri'")
    }
    val (target, params) = rest.split('?') match {
      case Array(p) => (p, Map.empty[String, String])
      case Array(p, q) => (p, q.split('&').map(_.split("=", 2) match {
        case Array(k, v) => k.trim -> v.trim
        case Array(k) => k.trim -> ""
      }).toMap)
      case _ => throw new IllegalArgumentException(s"bad sink uri '$uri'")
    }
    def mode = params.get("mode") match {
      case Some("append") => SaveMode.Append
      case Some("overwrite") | None => SaveMode.Overwrite
      case Some(other) => throw new IllegalArgumentException(s"unknown mode '$other'")
    }
    scheme match {
      case "parquet" | "json" | "csv" =>
        GraftSink.Files(target, format = scheme,
          partitionColumns = params.get("partitionBy")
            .map(_.split(',').map(_.trim).toSeq).getOrElse(Nil),
          maxRecordsPerFile = params.get("maxRecords").map(_.toLong).getOrElse(0L),
          saveMode = mode)
      case "topic" =>
        val strategy = params.getOrElse("strategy", "keymod") match {
          case "keymod" => Route.KeyMod
          case "keyhash" => Route.KeyHash
          case "bytype" => Route.ByEventType
          case other => throw new IllegalArgumentException(s"unknown route '$other'")
        }
        GraftSink.Topic(target,
          numPartitions = params.getOrElse("partitions", "8").toInt,
          strategy = strategy)
      case "batched" =>
        GraftSink.Batched(GraftSink.Files(target),
          batchDurationUs = params.getOrElse("windowUs", "3600000000").toLong,
          tsCol = params.getOrElse("tsCol", "commit_ts_us"))
      case "memory" => GraftSink.Memory(target)
      case "console" => GraftSink.Console(
        if (target.isEmpty) 20 else target.toInt)
      case other => throw new IllegalArgumentException(s"unknown sink scheme '$other'")
    }
  }
}
