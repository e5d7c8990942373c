package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Consumer-group assignment over a topic (reference README.md:17-23 —
  * the Kafka consumer side of the RFC's default sink: N cooperating
  * consumers divide the topic's partitions, rebalance on membership
  * change, and commit per-partition offsets; `kafka-consumer-groups
  * --describe` is exactly the (consumer, partition, end, committed,
  * lag) relation this module derives).
  *
  * Assignment is a PURE FUNCTION of (sorted members, strategy,
  * partition id) — Kafka's eager assignors, re-run from scratch at
  * each rebalance generation:
  *
  *  - '''range''': partitions split into contiguous runs; with
  *    P partitions and N consumers the first P mod N members own
  *    ⌈P/N⌉ partitions, the rest ⌊P/N⌋ (RangeAssignor);
  *  - '''roundrobin''': partition p → member p mod N
  *    (RoundRobinAssignor).
  *
  * Spark-first it is a scan-local CASE expression over the partition
  * column — assignment metadata never needs a shuffle or a driver
  * loop, and composes with [[graft.sources.TopicSource]]'s
  * `partitions` option (each member streams ONLY its assigned
  * directories — 1/N of the listing/footer I/O, not a filter after
  * the fact; TopicSourceSpec pins that disjoint members drain the
  * topic exactly once).
  */
object ConsumerGroups {

  /** 0-based owning-consumer index for partition `p` (a non-negative
    * int/long column) under `strategy` with `numConsumers` members of
    * a `numPartitions` topic. */
  def ownerIndex(strategy: String, numPartitions: Int, numConsumers: Int,
                 p: Column): Column = {
    require(numConsumers >= 1, "a group needs at least one member")
    strategy match {
      case "roundrobin" => pmod(p, lit(numConsumers)).cast("long")
      case "range" =>
        val quota = numPartitions / numConsumers
        val extra = numPartitions % numConsumers
        val boundary = extra.toLong * (quota + 1)
        // quota can be 0 (more members than partitions): then every
        // p < boundary = P and the otherwise-branch is unreachable;
        // max(quota,1) keeps its constant fold division-safe anyway
        when(p < boundary, floor(p / (quota + 1)))
          .otherwise(floor((p - boundary) / math.max(quota, 1)) + extra)
          .cast("long")
      case other => throw new IllegalArgumentException(
        s"unknown assignment strategy '$other' (range | roundrobin)")
    }
  }

  /** [[ownerIndex]] as plain driver-side arithmetic — assignment
    * metadata for WIRING a member's consumer (which partitions to pass
    * to TopicSource), where no Spark plan exists yet. Must stay the
    * exact formula of [[ownerIndex]] (TopicSourceSpec pins parity
    * across strategies, member counts, and partition counts). */
  def ownerIndexLocal(strategy: String, numPartitions: Int,
                      numConsumers: Int, p: Int): Int = {
    require(numConsumers >= 1, "a group needs at least one member")
    strategy match {
      case "roundrobin" => p % numConsumers
      case "range" =>
        val quota = numPartitions / numConsumers
        val extra = numPartitions % numConsumers
        val boundary = extra * (quota + 1)
        if (p < boundary) p / (quota + 1)
        else (p - boundary) / math.max(quota, 1) + extra
      case other => throw new IllegalArgumentException(
        s"unknown assignment strategy '$other' (range | roundrobin)")
    }
  }

  /** Owning-consumer NAME: members are sorted before indexing
    * (Kafka's assignors sort member ids, so assignment is independent
    * of join order). */
  def owner(strategy: String, numPartitions: Int, members: Seq[String],
            p: Column): Column = {
    val sorted = members.sorted
    element_at(array(sorted.map(lit): _*),
      (ownerIndex(strategy, numPartitions, sorted.size, p) + 1).cast("int"))
  }

  /** STICKY rebalance (the KIP-54 objective, deterministically): when
    * members leave, SURVIVORS KEEP every partition they own — zero
    * unnecessary movement, the property the eager assignors lack (an
    * eager round-robin re-deals almost everything) — and only the
    * departed members' partitions redistribute, round-robin over
    * survivors ordered by (inherited load asc, member id), so the
    * result is balanced to within one partition and independent of
    * evaluation order. `prev` is the prior assignment relation
    * (consumer, __partition, …extras ride along); adds `moved`
    * (1 = reassigned — exactly the departed members' partitions).
    * Every frame here is |partitions|-sized metadata; the windows and
    * the broadcast survivor-order join cost nothing at any data
    * scale. */
  def stickyRebalance(prev: DataFrame, survivors: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(survivors.nonEmpty, "a group needs at least one member")
    val surv = survivors.sorted
    val spark = prev.sparkSession
    import spark.implicits._
    val kept = prev.where(col("consumer").isin(surv: _*))
    val loads = kept.groupBy(col("consumer"))
      .agg(count(lit(1)).as("__load"))
    val order = surv.toDF("consumer")
      .join(loads, Seq("consumer"), "left")
      .withColumn("__load", coalesce(col("__load"), lit(0L)))
      .withColumn("__idx", row_number().over(
        Window.orderBy(col("__load"), col("consumer"))).cast("long") - 1)
      .select(col("consumer"), col("__idx"))
    val orphans = prev.where(!col("consumer").isin(surv: _*))
      .drop("consumer")
      .withColumn("__r", row_number().over(
        Window.orderBy(col("__partition"))).cast("long") - 1)
      .withColumn("__idx", col("__r") % surv.size)
    kept.withColumn("moved", lit(0L))
      .unionByName(
        orphans.join(broadcast(order), Seq("__idx"))
          .drop("__r", "__idx")
          .withColumn("moved", lit(1L)))
  }

  /** Group LIVENESS (Kafka's session.timeout.ms contract): the
    * coordinator evicts a member whose last heartbeat is older than
    * the session timeout, then bumps the generation and rebalances.
    * `heartbeats` is the raw (consumer, hb_ts_us) relation (the A42
    * lag-window shape); "now" is the group's NEWEST heartbeat — the
    * coordinator clock derived from the relation itself, a 1-row
    * broadcast, so the audit is deterministic and cross-engine
    * checkable. Returns (consumer, last_hb_us, gap_us, evicted).
    * |members|-grain metadata at any scale. */
  def evictions(heartbeats: DataFrame, sessionTimeoutUs: Long): DataFrame = {
    val last = heartbeats.groupBy(col("consumer"))
      .agg(max(col("hb_ts_us")).as("last_hb_us"))
    val now = last.agg(max(col("last_hb_us")).as("__now_us"))
    last.crossJoin(broadcast(now))
      .withColumn("gap_us", col("__now_us") - col("last_hb_us"))
      .withColumn("evicted",
        (col("gap_us") > sessionTimeoutUs).cast("long"))
      .drop("__now_us")
  }

  /** The full liveness→rebalance composition (Kafka's missed-heartbeat
    * path, end to end): members past the session timeout are evicted
    * and the generation's assignment is STICKY-rebalanced over the
    * survivors ([[stickyRebalance]] — survivors keep every partition,
    * only the evicted members' partitions move). The survivor list is
    * |group members| rows — metadata-bounded driver state, exactly the
    * coordinator's own bookkeeping. */
  def rebalanceOnLiveness(prev: DataFrame, heartbeats: DataFrame,
                          sessionTimeoutUs: Long): DataFrame = {
    val survivors = evictions(heartbeats, sessionTimeoutUs)
      .where(col("evicted") === 0L)
      .select(col("consumer"))
      .collect().map(_.getString(0)).toSeq // |members| — metadata
    stickyRebalance(prev, survivors)
  }

  /** COOPERATIVE (incremental) rebalance — the KIP-429 objective,
    * deterministically: on a membership change, generation g revokes
    * ONLY the partitions that must move (members keep serving the
    * rest — no stop-the-world), and generation g+1 assigns the
    * revoked+orphaned pool to under-target members. Targets are
    * ⌈P/N⌉ for the first P mod N members and ⌊P/N⌋ for the rest,
    * granted heaviest-current-owner-first so movement is minimal;
    * each over-target member revokes its HIGHEST-numbered partitions
    * down to target; the pool fills deficits in (member id) order.
    * Handles joins (newcomers have load 0) and leaves (a departed
    * member's partitions join the pool) in one pass. Adds `moved`
    * (1 = revoked-and-reassigned — the partitions eager would have
    * moved are a strict superset whenever the change is a join).
    * Every frame is |partitions|-sized metadata. */
  def cooperativeRebalance(prev: DataFrame, members: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(members.nonEmpty, "a group needs at least one member")
    val ms = members.sorted
    val spark = prev.sparkSession
    import spark.implicits._
    // the protocol input is the coordinator's own bookkeeping —
    // |partitions| rows of metadata. Materialize it ONCE: `prev` is
    // reused half a dozen times below (count, kept, loads, orphans),
    // and without this each reuse re-derives the caller's upstream,
    // often a full topic assignment (the r16 bench mover
    // cdc_topic_groups_coop paid ~6 topic-window re-derivations)
    val prevM = prev.localCheckpoint()
    val p = prevM.count() // |partitions| rows — metadata
    val n = ms.size
    val quota = p / n
    val extra = (p % n).toInt
    val kept0 = prevM.where(col("consumer").isin(ms: _*))
    val loads = ms.toDF("consumer")
      .join(kept0.groupBy(col("consumer"))
        .agg(count(lit(1)).as("__load")), Seq("consumer"), "left")
      .withColumn("__load", coalesce(col("__load"), lit(0L)))
    val targets = loads
      .withColumn("__ti", row_number().over(
        Window.orderBy(desc("__load"), col("consumer"))).cast("long") - 1)
      .withColumn("__target",
        lit(quota) + when(col("__ti") < extra, 1L).otherwise(0L))
      .select(col("consumer"), col("__load"), col("__target"))
    val ranked = kept0
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("consumer"))
          .orderBy(col("__partition"))).cast("long"))
      .join(broadcast(targets), Seq("consumer"))
    val retained = ranked.where(col("__rk") <= col("__target"))
      .drop("__rk", "__load", "__target")
      .withColumn("moved", lit(0L))
    val revoked = ranked.where(col("__rk") > col("__target"))
      .drop("__rk", "__load", "__target")
    val orphans = prevM.where(!col("consumer").isin(ms: _*))
    val pool = revoked.drop("consumer")
      .unionByName(orphans.drop("consumer"))
      .withColumn("__r", row_number().over(
        Window.orderBy(col("__partition"))).cast("long") - 1)
    val slots = targets
      .withColumn("__deficit",
        col("__target") - least(col("__load"), col("__target")))
      .where(col("__deficit") > 0)
      .select(col("consumer"),
        explode(sequence(lit(1L), col("__deficit"))).as("__j"))
      .withColumn("__r", row_number().over(
        Window.orderBy(col("consumer"), col("__j"))).cast("long") - 1)
      .select(col("consumer"), col("__r"))
    retained.unionByName(
      pool.join(broadcast(slots), Seq("__r")).drop("__r")
        .withColumn("moved", lit(1L)))
  }

  /** The `--describe` relation for one rebalance generation:
    * (strategy, generation, consumer, __partition, end_offset,
    * committed_offset, lag) from a per-partition ends frame
    * (`__partition`, `end_offset`) and a committed-offset column. */
  def describe(ends: DataFrame, committed: Column, strategy: String,
               generation: Long, numPartitions: Int,
               members: Seq[String]): DataFrame =
    ends.select(
      lit(strategy).as("strategy"),
      lit(generation).as("generation"),
      owner(strategy, numPartitions, members, col("__partition"))
        .as("consumer"),
      col("__partition"),
      col("end_offset"),
      committed.as("committed_offset"),
      (col("end_offset") - committed).as("lag"))
}
