package graft.cdc

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** HTTP out-of-process plugin runner (reference README.md:44-49 — the
  * RFC's RPC/HTTP hook form: plugins deployed as network services with
  * an SDK, called by the pipeline instead of spawned by it). The
  * sibling of [[PipedTransform]] for plugins that live behind an
  * endpoint rather than on the executor's PATH.
  *
  * Spark-first: the transport is `mapPartitions` over the row-JSON
  * stream — every EXECUTOR posts its own partitions (ndjson request →
  * ndjson response) straight to the plugin service; the driver never
  * sees a row. Per-JVM connection POOL: one shared [[HttpClient]]
  * (HTTP/1.1 keep-alive) per executor, so a 10k-partition job reuses a
  * handful of sockets per host instead of opening one per batch.
  *
  * Contract (the [[PipedTransform]] discipline, transport swapped):
  *  - '''batched''' — `batchSize` rows per POST amortize round-trips
  *    (the RFC's batch-write optimization applied to the hook RPC);
  *  - '''schema-checked''' — the declared `outputSchema` re-types each
  *    response line; strict mode parses FAILFAST so one malformed
  *    plugin line fails the task IN-PLAN, which the streaming DLQ
  *    path ([[graft.streaming.CdcStream.deliverWithDlq]]) turns into a
  *    quarantined micro-batch — the poison-batch contract;
  *  - '''fail loud, retry transient''' — a non-200 response throws
  *    (poison batch → DLQ); connect/IO errors retry `maxRetries`
  *    times with linear backoff before giving up, so a plugin restart
  *    doesn't kill the feed but a broken plugin cannot silently drop
  *    rows;
  *  - '''config-driven''' — [[register]] names the endpoint in the
  *    [[ChainConfig]] `transform:` registry; deploying a plugin is a
  *    config change, never a pipeline rebuild.
  */
object HttpTransform {

  /** One pooled client per JVM (executor-side singleton — object fields
    * are per-classloader, exactly the pool scope we want). */
  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .version(HttpClient.Version.HTTP_1_1)
    .build()

  /** POST one ndjson batch, returning response lines. Retries only
    * IO-class failures; an HTTP error status is a plugin bug and
    * throws immediately (the batch poisons → DLQ upstream).
    *
    * ==At-least-once delivery / the idempotence contract==
    *
    * An IOException retry can re-deliver a batch the plugin ALREADY
    * processed (the response was lost mid-read, not the request) — and
    * beyond this client, Spark itself re-runs whole tasks (speculation,
    * executor loss), re-posting every batch of the partition. A plugin
    * endpoint therefore observes AT-LEAST-ONCE batch delivery and must
    * be stateless-per-batch (a pure transform — the normal case) or
    * dedup on the `X-Graft-Batch-Id` header: a deterministic
    * content-derived id (UUIDv3 over the request body), identical on
    * every redelivery of the same batch and distinct across batches, so
    * a side-effecting endpoint can make itself exactly-once with one
    * seen-set lookup (ChainConfigSpec pins id stability across
    * redelivery). */
  private[graft] def batchId(body: String): String =
    java.util.UUID.nameUUIDFromBytes(
      body.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString

  private def post(endpoint: String, body: String, timeoutSec: Long,
                   maxRetries: Int): Iterator[String] = {
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofSeconds(timeoutSec))
      .header("Content-Type", "application/x-ndjson")
      .header("X-Graft-Batch-Id", batchId(body))
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    var attempt = 0
    while (true) {
      try {
        val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() != 200)
          throw new IllegalStateException(
            s"plugin endpoint $endpoint returned HTTP ${resp.statusCode()}: " +
              resp.body().take(200))
        return resp.body().linesIterator.filter(_.nonEmpty)
      } catch {
        case e: java.io.IOException if attempt < maxRetries =>
          attempt += 1
          Thread.sleep(200L * attempt)
      }
    }
    Iterator.empty // unreachable
  }

  /** Build the `DataFrame => DataFrame` transform around an HTTP
    * plugin endpoint emitting one JSON object per input line. */
  def transform(endpoint: String, outputSchema: StructType,
                batchSize: Int = 512, strict: Boolean = true,
                timeoutSec: Long = 60, maxRetries: Int = 2)
               (df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val lines = df.toJSON.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        post(endpoint, batch.mkString("\n"), timeoutSec, maxRetries)
      }
    }
    PipedTransform.parseLines(lines, outputSchema, strict)
  }

  /** Register under `name` so chain configs reference `transform:name`
    * — deploying an HTTP plugin is a registry call, no recompilation. */
  def register(name: String, endpoint: String, outputDdl: String,
               batchSize: Int = 512, strict: Boolean = true): Unit =
    ChainConfig.registerTransform(name,
      transform(endpoint, StructType.fromDDL(outputDdl), batchSize, strict))
}
