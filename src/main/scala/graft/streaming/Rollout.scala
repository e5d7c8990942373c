package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.cdc.{Changefeed, GraftSink, TransformPlugin}

/** A plugin chain with an explicit rollout version. Versions are
  * monotone: an upgrade must carry a strictly larger version, which is
  * what makes every 2PC phase idempotent (re-applying an already-active
  * version is a visible no-op, not a double-swap). */
final case class VersionedChain(version: Int, chain: Changefeed)

/** 2PC plugin rollout over a running changefeed (reference
  * README.md:99-119 — the RFC's Prepare / Pause / Commit lifecycle for
  * swapping sink-plugin versions across a TiCDC cluster without losing
  * or double-processing events; the RFC requires all three phases to be
  * idempotent).
  *
  * Spark-first, the cluster-wide coordination problem collapses into the
  * streaming checkpoint: committed source offsets are the single durable
  * record of "what v1 has fully processed", shared by every executor.
  * The three phases become:
  *
  *  - '''Prepare''' — stage chain v(n+1) and validate it against the
  *    changelog schema by analyzing it over an empty frame: analysis
  *    errors (missing columns, type mismatches) surface here, before the
  *    running feed is touched. The RFC's "distribute the plugin file to
  *    every node" is Spark's closure serialization — each micro-batch
  *    ships the active chain to executors, so distribution needs no
  *    separate step.
  *  - '''Pause''' — drain the running query. With
  *    `Trigger.AvailableNow` the query processes everything already in
  *    the source and stops; offsets land in the checkpoint. Pausing an
  *    already-stopped feed is a no-op.
  *  - '''Commit''' — promote the staged chain and resume from the SAME
  *    checkpoint. The first v(n+1) batch starts exactly at the offset
  *    v(n) finished: no event is lost, none is processed twice, and
  *    events that arrived while paused are processed by the new version
  *    (exactly the RFC's reload semantics).
  *
  * Every delivered row is tagged `__chain_version`, so a sink can audit
  * which plugin version processed it — the observable contract the
  * rollout test pins: each input event appears exactly once, under
  * exactly one version, with the version boundary at the drain point.
  */
final class ChainRollout(
    spark: SparkSession,
    sourceDir: String,
    schema: StructType,
    sink: GraftSink,
    checkpointDir: String,
    initial: VersionedChain) {

  @volatile private var active: VersionedChain = initial
  @volatile private var staged: Option[VersionedChain] = None
  @volatile private var running: Option[StreamingQuery] = None

  def activeVersion: Int = active.version
  def stagedVersion: Option[Int] = staged.map(_.version)

  /** The active chain plus the audit tag — the version column is part of
    * the rollout contract, not of any user plugin. */
  private def tagged(vc: VersionedChain): Changefeed =
    Changefeed(vc.chain.plugins :+ TransformPlugin(
      s"chain-version-tag[v${vc.version}]",
      _.withColumn("__chain_version", lit(vc.version))))

  /** Start (or restart) delivery under the currently-active chain.
    * `Trigger.AvailableNow` drains what the source holds and stops, with
    * offsets checkpointed — call again after new flushes arrive, or call
    * [[drain]] to block until this round completes. Restarting with no
    * new input is idempotent: the checkpoint replays nothing. */
  def start(): StreamingQuery = {
    val q = CdcStream.deliver(
      CdcStream.fromParquetDir(spark, sourceDir, schema),
      tagged(active), sink, checkpointDir)
    running = Some(q)
    q
  }

  /** Block until the in-flight drain completes (phase-1 helper). */
  def drain(): Unit = running.foreach(_.awaitTermination())

  /** '''Prepare''': stage the next chain version. Validates PER PLUGIN
    * over an empty changelog of the source schema
    * ([[Changefeed.diagnose]]) — a broken plugin fails HERE, named in
    * the rejection, leaving the running v(n) feed untouched (the RFC
    * future-work safety item: a bad plugin must fail validation, not
    * crash the feed). Idempotent: re-preparing the same version
    * re-validates and re-stages. Staging a version at or below the
    * active one is rejected (the monotonicity that makes commit
    * replay-safe). */
  def prepare(next: VersionedChain): Unit = {
    require(next.version > active.version,
      s"rollout must move forward: staged v${next.version} vs active v${active.version}")
    val failed = next.chain.diagnose(spark, schema)
      .find(_.status == graft.cdc.PluginCheck.Failed)
    failed.foreach { f =>
      throw new IllegalArgumentException(
        s"Prepare rejected chain v${next.version}: plugin '${f.plugin}' " +
          s"failed validation: ${f.error.getOrElse("")}")
    }
    staged = Some(next)
  }

  /** '''Pause''': stop the running feed at a batch boundary. Offsets for
    * every completed batch are already durable in the checkpoint, so
    * nothing in-flight is lost. Idempotent: pausing a drained or
    * never-started feed is a no-op. */
  def pause(): Unit = {
    running.foreach { q => if (q.isActive) q.stop(); q.awaitTermination() }
    running = None
  }

  /** '''Abort''' (rollback): discard whatever is staged. The active
    * v(n) chain is untouched — a failed or regretted Prepare never
    * affects the running feed, which is the RFC's idempotence story for
    * a rollout that doesn't reach Commit. Idempotent: aborting with
    * nothing staged is a no-op. */
  def abort(): Unit = staged = None

  /** '''Commit''': promote the staged chain. The swap itself is a
    * metadata flip — delivery resumes from the shared checkpoint on the
    * next [[start]], under the new version. Idempotent: committing with
    * nothing staged (e.g. a repeated commit) is a no-op. */
  def commit(): Unit = {
    staged.foreach { next => active = next }
    staged = None
  }

  /** The full upgrade, RFC-ordered: Prepare → Pause → Commit → resume. */
  def rollout(next: VersionedChain): Unit = {
    prepare(next)
    pause()
    commit()
  }
}
