package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.Blooms

/** Document deduplication for training-data pipelines.
  *
  * Scale shapes (SURVEY.md §5):
  *  - exact: ONE hash-shuffle on the content digest with map-side partial
  *    aggregation — shuffled bytes ~ |distinct digests per task|, never the
  *    corpus. No window sort, no full-text shuffle (only the 32-byte hash
  *    and the id move).
  *  - near-dup (MinHash / SimHash, see [[Shingle]] companions below): band
  *    or chunk equi-joins so candidate pairs ~ true near-dups, not n².
  */
object Dedup {

  /** Default hot-block cap for [[ngramJaccardPairs]]: bounds per-block
    * pair work at maxBlock² while staying a no-op for genuinely
    * fine-grained blocking keys. Mirrored verbatim in the generated
    * DuckDB oracle so both engines skip the same blocks. */
  val DefaultMaxBlock = 1024

  /** Exact dedup on the sha256 of `textCol`: one surviving representative
    * (min id) per distinct content, plus the duplicate count.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies"))

  /** Incremental exact dedup: the surviving rows of a NEW crawl batch
    * against an already-ingested corpus — in-batch dedup (min id per
    * distinct content) followed by an anti-join dropping content the
    * corpus already holds.
    *
    * Scale shape: both sides reduce to (digest) / (digest, min id)
    * BEFORE the anti-join, so the join shuffles 32-byte digests — never
    * text — and the corpus side carries no payload at all. The corpus
    * digest set can also be maintained as a bucketed table so repeated
    * daily batches co-locate on digest with no re-shuffle. */
  def incremental(newBatch: DataFrame, corpus: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    val seen = corpus.select(sha2(col(textCol), 256).as("content_hash")).distinct()
    newBatch
      .groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .join(seen, Seq("content_hash"), "left_anti")
  }

  /** Maintain the ingested-corpus digest set as a BUCKETED table (hash-
    * partitioned and sorted on `content_hash` at write time) so repeated
    * daily [[incrementalAgainstDigests]] batches co-locate on digest with
    * no re-shuffle of the corpus side — at 100 TB the corpus digest set
    * is billions of rows, and re-shuffling it on every daily batch would
    * dominate the job; bucketed, it is scanned in place and only the
    * (much smaller) daily batch shuffles. `buckets` should match the
    * batch side's agg partitioning (spark.sql.shuffle.partitions) so the
    * join needs no additional exchange on either side. */
  def writeCorpusDigests(corpus: DataFrame, idCol: String, textCol: String,
                         table: String, buckets: Int): Unit =
    corpus.select(sha2(col(textCol), 256).as("content_hash")).distinct()
      .write.mode("overwrite")
      .bucketBy(buckets, "content_hash").sortBy("content_hash")
      .format("parquet").saveAsTable(table)

  /** [[incremental]] against a digest table written by
    * [[writeCorpusDigests]]: same semantics, but the corpus side is a
    * pre-bucketed scan — the plan has NO Exchange above it (pinned by
    * BucketingSpec). Append the surviving digests back to the table
    * (mode=append preserves bucketing) to roll the corpus forward. */
  def incrementalAgainstDigests(newBatch: DataFrame, digestTable: String,
                                idCol: String, textCol: String): DataFrame =
    newBatch
      .groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .join(newBatch.sparkSession.table(digestTable),
        Seq("content_hash"), "left_anti")

  /** Bloom sketch over the corpus content digests — built DISTRIBUTED
    * (partial per-partition sketches merged on the driver, the standard
    * `stat.bloomFilter` tree aggregation; only the merged bitset ever
    * reaches the driver, never the digests). A production pipeline
    * builds this once when the ledger rolls forward and persists
    * [[graft.functions.Blooms.serialize]]'s bytes next to the digest
    * table; daily batches reload it instead of re-scanning the corpus.
    *
    * Sizing: ~1.2 bytes/item at fpp=1%, so even a 10-billion-digest
    * ledger sketches to ~12 GB — chunkable per digest-bucket if a single
    * executor can't hold it; at the SFs here it is a few hundred KB. */
  def buildDigestBloom(corpus: DataFrame, textCol: String,
                       expectedItems: Long, fpp: Double = 0.01): BloomFilter =
    corpus.select(sha2(col(textCol), 256).as("content_hash")).distinct()
      .stat.bloomFilter(col("content_hash"), expectedItems, fpp)

  /** [[incremental]] with a scan-local Bloom prefilter: batch digests
    * that MISS the sketch are definitely-new (Bloom has no false
    * negatives) and bypass the anti-join entirely; only HITS — true
    * dupes plus the fpp tail — are verified exactly against the corpus
    * digest set. The result is therefore EXACTLY [[incremental]]'s
    * (same oracle), but at 100 TB the join's probe side shrinks from
    * |batch| to |dupes| + fpp·|batch| — for a mostly-novel crawl that
    * is a ~100× smaller shuffle, and the definitely-new majority never
    * leaves its scan task.
    *
    * Both branches share the identical digest-aggregation subtree, so
    * the batch is shuffled once and the second branch reads the reused
    * exchange (AQE `ReusedExchange`), not a second scan. */
  def incrementalBloom(newBatch: DataFrame, corpus: DataFrame,
                       bloom: BloomFilter,
                       idCol: String, textCol: String): DataFrame = {
    val seen = corpus.select(sha2(col(textCol), 256).as("content_hash")).distinct()
    val agg = newBatch
      .groupBy(sha2(col(textCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
    val maybeSeen = Blooms.mightContain(col("content_hash"), bloom)
    agg.where(!maybeSeen)
      .unionByName(
        agg.where(maybeSeen).join(seen, Seq("content_hash"), "left_anti"))
  }

  /** Near-dup clusters from a pair list: connected components by
    * iterative min-label propagation — every doc in a component ends
    * with `cluster_id` = the smallest doc id reachable through near-dup
    * pairs, which is the "keep one representative per group" step that
    * turns pairwise near-dup output ([[MinHash.neardupPairs]]) into a
    * drop list.
    *
    * Each iteration: one join of the (symmetric) edge list against the
    * current labels and one min-aggregation — no driver-side state, and
    * the label frame is `localCheckpoint`ed per pass like
    * [[KMeans.fit]]. Iteration runs TO THE FIXPOINT: after each pass one
    * cheap count on the two (checkpointed) label frames detects whether
    * any label still changed, and the loop stops at zero — so a
    * chain-shaped component of any diameter merges fully (a fixed pass
    * count silently under-merges components deeper than it), and the
    * common case (tiny cliques, converged in 2-3 passes) doesn't pay for
    * slack passes. `maxIters` is a safety bound only; hitting it raises
    * rather than returning a silently under-merged labeling. For
    * guaranteed log-diameter round counts at adversarial scale, the
    * public alternative is large-star/small-star (Kiveris et al.,
    * "Connected Components in MapReduce") — same per-round plan shape. */
  def clusters(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b",
               maxIters: Int = 64): DataFrame = {
    // materialize the edge list once: it re-enters every iteration's
    // join, and deriving it repeatedly would re-run the whole upstream
    // pair pipeline (e.g. MinHash) per pass — measured 7.3 s → ~1 s.
    // The pair pipeline itself is materialized FIRST: the symmetric
    // union below references `pairs` twice, so building edges straight
    // off the pipeline ran MinHash twice even for the single edge
    // materialization (guide §2.4 — the recomputed subtree again).
    val p = pairs.select(col(idA), col(idB)).localCheckpoint()
    val edges = p.select(col(idA).as("a"), col(idB).as("b"))
      .unionAll(p.select(col(idB).as("a"), col(idA).as("b")))
      .localCheckpoint()
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint()
    var changed = 1L
    var pass = 0
    while (changed > 0L) {
      if (pass >= maxIters)
        throw new IllegalStateException(
          s"Dedup.clusters did not converge within $maxIters passes - " +
            "component diameter exceeds the safety bound; raise maxIters " +
            "or switch to large-star/small-star rounds")
      val viaNeighbors = edges
        .join(labels, col("b") === col("doc_id"))
        .select(col("a").as("doc_id"), col("cluster_id"))
      val next = labels.unionAll(viaNeighbors)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
        .localCheckpoint()
      // fixpoint check: min-label propagation only ever lowers labels, so
      // "no row changed" == converged. Both sides are checkpointed 2-long
      // frames; this is one hash join + count, far cheaper than a wasted
      // propagation pass (which costs an edge join over the full pair list).
      changed = next
        .join(labels.select(col("doc_id"), col("cluster_id").as("__prev")),
          "doc_id")
        .where(col("cluster_id") =!= col("__prev"))
        .count()
      labels = next
      pass += 1
    }
    labels
  }

  /** Incremental connected components — update a prior labeling with a
    * batch of NEW edges without re-running the full edge fixpoint.
    *
    * A prior (doc_id, cluster_id = component min) labeling IS its
    * components' transitive closure, re-encoded as a STAR: every
    * member points at the component min. Treating those rows as edges
    * and unioning the new batch's pairs therefore reproduces exactly
    * the components of (all edges so far) — `clustersIncremental(prev,
    * newPairs) == clusters(oldPairs ∪ newPairs)` as an identity (the
    * `doc_neardup_clusters_incr` oracle is the full-recompute SQL, so
    * the parity gate proves it cross-engine; component-min self-rows
    * carry no information and are dropped — any component of size ≥ 2
    * keeps its min alive as some member's target). Labelings produced
    * by [[clusters]] contain no singleton components, but a CALLER-
    * seeded labeling may (e.g. one row per corpus doc): those rows
    * have only a self-edge to contribute, so after the fixpoint they
    * are re-attached verbatim via an anti-join rather than silently
    * dropped.
    *
    * Scale shape: the star edges have diameter ≤ 2, so however deep
    * the ORIGINAL near-dup chains were, the min-label fixpoint over
    * (star ∪ batch) converges in ~2-3 passes; per-pass work is
    * |labels| + |new pairs| edge rows — the daily-crawl update cost,
    * not the corpus re-cluster cost. */
  def clustersIncremental(prevLabels: DataFrame, newPairs: DataFrame,
                          idA: String = "id_a", idB: String = "id_b",
                          maxIters: Int = 64): DataFrame = {
    val starEdges = prevLabels
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idA), col("cluster_id").as(idB))
    val merged = clusters(starEdges.unionAll(newPairs.select(col(idA), col(idB))),
      idA, idB, maxIters)
    // Prior components that contributed no edge (singletons untouched
    // by the new batch) are absent from the fixpoint output; carry
    // them through unchanged instead of losing them.
    val untouched = prevLabels
      .join(merged.select(col("doc_id")), Seq("doc_id"), "left_anti")
    merged.unionAll(untouched.select(col("doc_id"), col("cluster_id")))
  }

  /** Connected components by alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    * same output contract as [[clusters]] (doc_id, cluster_id =
    * component min) but converging in O(log d) rounds instead of d for
    * a component of diameter d: each round re-wires every node toward
    * its neighborhood minimum, collapsing paths exponentially. Use for
    * corpora where near-dup chains can be long (boilerplate-heavy
    * crawls); [[clusters]] remains the simpler choice when diameters
    * are known small.
    *
    * Every round is two groupBy-min + equi-join passes over the edge
    * frame — no collect_list (a viral hub never materializes its
    * neighborhood in one row), every intermediate localCheckpointed so
    * lineage stays flat. Convergence = edge set unchanged (two anti-join
    * counts on checkpointed canonical frames). */
  def clustersStar(pairs: DataFrame, idA: String = "id_a",
                   idB: String = "id_b", maxIters: Int = 32): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(least(col("u"), col("v")).as("lo"),
        greatest(col("u"), col("v")).as("hi"))
      .where(col("lo") =!= col("hi"))
      .distinct()
    var e = canon(pairs.select(col(idA).as("u"), col(idB).as("v")))
      .localCheckpoint()
    var changed = 1L
    var pass = 0
    while (changed > 0L) {
      if (pass >= maxIters)
        throw new IllegalStateException(
          s"clustersStar did not converge within $maxIters rounds")
      // large-star: every node points its LARGER neighbors at the min
      // of its closed neighborhood
      val sym = e.select(col("lo").as("u"), col("hi").as("v"))
        .unionAll(e.select(col("hi").as("u"), col("lo").as("v")))
      val nbrMin = sym.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))
      val ls = canon(sym.join(nbrMin, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
        .localCheckpoint()
      // small-star: every node rewires its SMALLER neighbors (and
      // itself) to the min of those
      val down = ls.select(col("hi").as("u"), col("lo").as("v"))
      val downMin = down.groupBy("u").agg(min(col("v")).as("m"))
      val ss = canon(
        down.join(downMin, "u").select(col("v").as("u"), col("m").as("v"))
          .unionAll(downMin.select(col("u"), col("m").as("v"))))
        .localCheckpoint()
      // both frames are canonical DISTINCT sets: when the counts match,
      // one-sided inclusion (ss ⊆ e) already implies equality — the
      // second anti-join is only needed on a size change (it never is:
      // sizes equal + ss\e empty ⇒ equal). Halves the per-round
      // convergence cost.
      val (nE, nSs) = (e.count(), ss.count())
      changed = if (nE != nSs) 1L else ss.exceptAll(e).count()
      e = ss
      pass += 1
    }
    // converged edge set is a star forest: every non-center appears as
    // `hi` exactly once, pointing at its component min
    val members = e.select(col("hi").as("doc_id"), col("lo").as("cluster_id"))
    val centers = e.select(col("lo").as("doc_id")).distinct()
      .join(members, Seq("doc_id"), "left_anti")
      .withColumn("cluster_id", col("doc_id"))
    members.unionAll(centers)
  }

  /** Canonical representative per near-dup cluster — the "keep which
    * copy?" decision after [[clusters]]: the member with the MOST
    * tokens wins (longest copy ≈ least-truncated crawl), ties broken by
    * min id so the choice is deterministic and re-run-stable.
    *
    * Scale shape: one equi-join of the (doc, cluster) labels against a
    * token-count projection of the corpus (text itself never moves),
    * then two window functions over the SAME cluster partition — one
    * exchange, clusters ≫ cores, no global sort.
    *
    * Output: (cluster_id, rep_id, rep_tokens, n_members). */
  def clusterReps(labels: DataFrame, docs: DataFrame,
                  idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sized = labels.join(
      docs.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens")),
      idCol)
    val byCluster = Window.partitionBy(col("cluster_id"))
    val pick = byCluster.orderBy(desc("n_tokens"), col(idCol))
    sized
      .withColumn("__rn", row_number().over(pick))
      .withColumn("n_members", count(lit(1)).over(byCluster))
      .where(col("__rn") === 1)
      .select(col("cluster_id"), col(idCol).as("rep_id"),
        col("n_tokens").as("rep_tokens"), col("n_members"))
  }

  /** Word n-gram Jaccard similarity on blocked candidate pairs: only
    * pairs sharing `blockCol` are compared (classic blocking — an
    * equi-join, so candidates ~ |block|² per block, never corpus²).
    * The sets are HASHED shingles (8-byte longs): ~2× smaller shuffle
    * rows and primitive-equality intersects instead of string hashing —
    * measured 102 s → seconds at sf0.1. The oracle hashes identically,
    * so the rare 32-bit collision affects both engines the same way.
    * Output: id_a, id_b, jaccard (round 4) where jaccard >= threshold.
    *
    * Scale caveat: this is the declared BLOCKED BASELINE, not the 100 TB
    * path. Pair count grows quadratically *per block* — if block sizes
    * grow with the corpus (they do for a coarse key like `source`), a
    * 100× corpus means ~10,000× pairs inside each block. `maxBlock` is
    * the enforcement of that caveat (same role as [[SimHash]]'s
    * `maxBucket` stop-bucket guard): blocks holding more than `maxBlock`
    * docs are DROPPED from candidate generation, so a coarse blocking
    * key degrades to "skip the hot blocks" instead of n² — per-block
    * pair work is bounded by maxBlock² regardless of corpus growth. Docs
    * in a skipped block get no pairs; for completeness there use
    * [[MinHash.neardupPairs]] (C2), whose band-bucket equi-join keeps
    * candidates proportional to true near-dups at any corpus size. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCol: String, n: Int, threshold: Double,
                        maxBlock: Int = DefaultMaxBlock): DataFrame = {
    val all = docs
      .select(col(idCol).as("doc_id"), col(blockCol).as("blk"),
        MinHash.hashedShingles(col(textCol), n).as("hv"))
      .where(size(col("hv")) > 0)
    // hot-block guard: |block| > maxBlock would contribute >maxBlock²
    // pairs — drop it (the count is a partial agg on the already-computed
    // shingle frame; the semi-join broadcasts the small block list)
    val smallBlocks = all.groupBy("blk")
      .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBlock)
      .select("blk")
    val sets = all.join(smallBlocks, Seq("blk"), "left_semi")
    // Small-input guard: a sub-split-size corpus file scans as ONE
    // partition, serializing every pairwise evaluation of the broadcast
    // join's stream side. Round-robin it across the cluster when the
    // scan is narrower than the available slots; with a real (many-
    // partition) corpus this is a no-op, so no extra shuffle at scale.
    val cores = docs.sparkSession.sparkContext.defaultParallelism
    val spread =
      if (sets.rdd.getNumPartitions < cores) sets.repartition(cores) else sets
    val a = spread.select(col("doc_id").as("id_a"), col("blk"), col("hv").as("ha"))
    val b = sets.select(col("doc_id").as("id_b"), col("blk").as("blk_b"), col("hv").as("hb"))
    val inter = graft.functions.SetOps
      .sortedIntersectCount(col("ha"), col("hb")).cast("double")
    val jac = inter / (size(col("ha")) + size(col("hb")) - inter)
    a.join(b, col("blk") === col("blk_b") && col("id_a") < col("id_b"))
      .withColumn("jac", jac)
      .where(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jac"), 4).as("jaccard"))
  }

  /** Input annotated with its content digest + a `is_duplicate` flag (true
    * for every row that is not the keeper) — the filter form pipelines use
    * to drop dupes while keeping lineage. */
  def markDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keepers = exact(docs, idCol, textCol).select("content_hash", "keep_id")
    docs
      .withColumn("content_hash", sha2(col(textCol), 256))
      .join(keepers, "content_hash")
      .withColumn("is_duplicate", col(idCol) =!= col("keep_id"))
  }

  /** Corpus snapshot diff — crawl N vs crawl N+1 at document
    * granularity: which ids appeared, vanished, changed content, or
    * stayed identical (the curation-side analogue of the CDC net-change
    * delta; the first question after every re-crawl).
    *
    * Scale shape: both sides reduce to (id, 32-byte digest) at the
    * scan — text never shuffles — then ONE full-outer equi-join on id
    * classifies every row; counts are a tiny follow-up agg. Bucketing
    * both snapshot tables by id makes the join exchange-free on a
    * standing deployment.
    *
    * Output: (idCol, disposition ∈ added|removed|changed|unchanged). */
  def snapshotDiff(prev: DataFrame, next: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    def digests(df: DataFrame, side: String) = df.select(
      col(idCol), sha2(col(textCol), 256).as(s"__h_$side"))
    digests(prev, "p")
      .join(digests(next, "n"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__h_p").isNull, lit("added"))
          .when(col("__h_n").isNull, lit("removed"))
          .when(col("__h_p") === col("__h_n"), lit("unchanged"))
          .otherwise(lit("changed")).as("disposition"))
  }

  /** DuckDB mirror of [[snapshotDiff]] over two table expressions. */
  def snapshotDiffSql(prevRel: String, nextRel: String, id: String,
                      text: String): String =
    s"""WITH p AS (SELECT $id, sha256($text) AS hp FROM $prevRel),
       |n AS (SELECT $id, sha256($text) AS hn FROM $nextRel),
       |j AS (
       |  SELECT coalesce(p.$id, n.$id) AS $id, hp, hn
       |  FROM p FULL OUTER JOIN n ON p.$id = n.$id)
       |SELECT $id,
       |  CASE WHEN hp IS NULL THEN 'added'
       |       WHEN hn IS NULL THEN 'removed'
       |       WHEN hp = hn THEN 'unchanged'
       |       ELSE 'changed' END AS disposition
       |FROM j""".stripMargin

  /** Substring-level exact dedup ("Deduplicating Training Data Makes
    * Language Models Better", Lee et al. 2022): every k-token span
    * occurring ≥ `minCount` times ANYWHERE in the corpus is marked,
    * and per document the marked positions merge into maximal
    * duplicated extents — the spans a curation pass would cut (whole-
    * document dedup misses templated boilerplate shared by otherwise-
    * distinct docs; this catches it at token granularity).
    *
    * Output: (idCol, span_start, span_end, span_tokens) per merged
    * span, token offsets 0-based inclusive.
    *
    * Scale shape: gram construction is scan-local (posexplode + a
    * slice against the carried token array — no window, no join);
    * duplicate detection is one combine-friendly `groupBy(gram)`; the
    * mark-back is an equi-join on the gram key; the span merge is the
    * gaps-and-islands pattern — two windows PARTITIONED by doc (docs ≫
    * cores) over only the duplicated positions. At 100 TB, group on
    * `xxhash64(gram)` instead of the gram string to cut shuffle bytes
    * ~6× (collision risk ~n²/2⁶⁴; use the string form, as here, when
    * exactness is the contract — it is also what keeps the DuckDB
    * oracle honest). */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
                      k: Int, minCount: Long = 2L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col(idCol), split(col(textCol), " ").as("__a"))
      .select(col(idCol), col("__a"), posexplode(col("__a")))
      .where(size(col("__a")) - col("pos") >= k)
      .select(col(idCol), col("pos"),
        concat_ws(" ", slice(col("__a"), col("pos") + 1, lit(k))).as("gram"))
    val dup = grams.groupBy("gram").agg(count(lit(1)).as("__c"))
      .where(col("__c") >= minCount).select("gram")
    val spans = grams.join(dup, "gram")
      .select(col(idCol), col("pos").cast("long").as("s"),
        (col("pos") + k - 1).cast("long").as("e"))
    val wPrev = Window.partitionBy(col(idCol)).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col(idCol)).orderBy(col("s"))
    spans
      .withColumn("__new", when(
        col("s") > coalesce(max(col("e")).over(wPrev), lit(-1L)),
        1L).otherwise(0L))
      .withColumn("__isl", sum(col("__new")).over(wRun))
      .groupBy(col(idCol), col("__isl"))
      .agg(min("s").as("span_start"), max("e").as("span_end"),
        (max("e") - min("s") + 1).as("span_tokens"))
      .select(col(idCol), col("span_start"), col("span_end"),
        col("span_tokens"))
  }

  /** DuckDB mirror of [[duplicatedSpans]] — same grams, same
    * gaps-and-islands merge. */
  def duplicatedSpansSql(table: String, id: String, text: String,
                         k: Int, minCount: Long = 2L): String =
    s"""WITH arr AS (
       |  SELECT $id, string_split($text, ' ') AS a FROM $table),
       |toks AS (
       |  SELECT $id, a, generate_subscripts(a, 1) - 1 AS pos,
       |         unnest(a) AS tok
       |  FROM arr),
       |grams AS (
       |  SELECT $id, pos, array_to_string(a[pos+1:pos+$k], ' ') AS gram
       |  FROM toks WHERE len(a) - pos >= $k),
       |dup AS (SELECT gram FROM grams GROUP BY 1
       |        HAVING count(*) >= $minCount),
       |spans AS (
       |  SELECT $id, pos AS s, pos + $k - 1 AS e
       |  FROM grams JOIN dup USING (gram)),
       |flagged AS (
       |  SELECT $id, s, e,
       |    CASE WHEN s > coalesce(max(e) OVER (PARTITION BY $id
       |        ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
       |        AND 1 PRECEDING), -1)
       |      THEN 1 ELSE 0 END AS f
       |  FROM spans),
       |islands AS (
       |  SELECT *, sum(f) OVER (PARTITION BY $id ORDER BY s) AS isl
       |  FROM flagged)
       |SELECT $id, CAST(min(s) AS BIGINT) AS span_start,
       |       CAST(max(e) AS BIGINT) AS span_end,
       |       CAST(max(e) - min(s) + 1 AS BIGINT) AS span_tokens
       |FROM islands GROUP BY $id, isl""".stripMargin
}
