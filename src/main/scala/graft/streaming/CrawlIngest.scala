package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming crawl ingestion with cross-batch exact dedup — the
  * production loop that turns an endless stream of crawl flushes into
  * an append-only deduplicated corpus:
  *
  * per micro-batch (one crawl flush):
  *  1. in-batch dedup (min-id representative per distinct content);
  *  2. anti-join the batch's content digests against the persistent
  *     digest ledger (everything the corpus already holds);
  *  3. append the survivors' DIGESTS to the ledger, then the survivor
  *     ROWS to the corpus.
  *
  * Scale shape: the ledger side joins on 64-hex digests only — crawl
  * text never re-shuffles against the corpus; at 100 TB the ledger is
  * the bucketed digest table of Dedup.writeCorpusDigests and the
  * anti-join is exchange-free on the corpus side.
  *
  * Delivery contract: digests are written BEFORE corpus rows, so a
  * crash between the two writes drops (not duplicates) that batch's
  * survivors on replay — the corpus never contains duplicate content
  * (the property dedup exists to protect); a lost flush is re-crawlable
  * and detectable by ledger-vs-corpus count drift. Exactly-once needs a
  * transactional table format; this is the strongest contract plain
  * parquet dirs support, and the spec pins replay convergence. */
object CrawlIngest {

  /** Start ingesting `stream` (doc rows with `idCol` + `textCol`).
    * `ledgerDir` holds one `content_hash` column; `corpusDir` the
    * surviving doc rows. */
  def start(stream: DataFrame, idCol: String, textCol: String,
            corpusDir: String, ledgerDir: String,
            checkpointDir: String): StreamingQuery = {
    // Ledger view carried ACROSS this drain's micro-batches (VERDICT
    // r18 ask #4): flush N's ledger is exactly flush N-1's ledger plus
    // flush N-1's survivor digests, so instead of re-listing and
    // re-scanning the growing parquet dir every flush, the first batch
    // reads disk once and later batches extend the view in memory with
    // the survivor frame that is ALREADY materialized for the write.
    // The closure dies with the query: a restarted drain re-reads disk
    // (recovery unchanged), and the disk write order (ledger before
    // corpus) is untouched, so the crash contract holds verbatim.
    var ledgerView: Option[Option[DataFrame]] = None
    val fn: (Dataset[Row], Long) => Unit = (batch, _) => {
      val spark = batch.sparkSession
      val frame = batch.toDF().localCheckpoint()
      val hashed = frame.withColumn("content_hash", sha2(col(textCol), 256))
      // 1. in-batch dedup: min-id row per distinct content
      val inBatch = hashed
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("content_hash")).orderBy(col(idCol))))
        .where(col("__rn") === 1).drop("__rn")
      // 2. drop content the ledger already holds
      val ledger = ledgerView.getOrElse {
        val fromDisk = existingLedger(spark, ledgerDir)
        ledgerView = Some(fromDisk)
        fromDisk
      }
      val survivors = (ledger match {
        case Some(l) => inBatch.join(l, Seq("content_hash"), "left_anti")
        case None => inBatch
      }).localCheckpoint() // both writes below reuse it; and the ledger
      // append must not re-read the ledger it is writing to
      // 3. ledger first (crash ⇒ drop, never duplicate), then corpus
      val digests = survivors.select(col("content_hash"))
      digests.write.mode(SaveMode.Append).parquet(ledgerDir)
      survivors.drop("content_hash")
        .write.mode(SaveMode.Append).parquet(corpusDir)
      ledgerView = Some(Some(ledger match {
        case Some(l) => l.unionByName(digests)
        case None => digests
      }))
    }
    stream.writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** [[start]]'s NEAR-dup sibling — the streaming form of
    * [[graft.operators.MinHash.incrementalNeardupPairs]]: the persistent
    * artifact is a BAND ledger (band, bkey, hv) instead of a digest
    * ledger, so each flush detects paraphrased/near-identical content
    * the exact digest misses.
    *
    * per micro-batch:
    *  1. in-batch exact dedup (min-id per distinct content; in-batch
    *     NEAR dups are `neardupPairs`' job, mirroring
    *     incrementalNeardupPairs' scope);
    *  2. band the batch, equi-join (band, bkey) against the band
    *     ledger, exact-verify Jaccard on the carried shingle sets —
    *     any batch doc matching ledger content >= threshold is dropped;
    *  3. append the survivors' band rows to the ledger FIRST, then the
    *     survivor rows to the corpus (crash ⇒ drop, never duplicate —
    *     same contract as [[start]]).
    *
    * Scale: the flush side is banded fresh (it is small); the ledger
    * side is the reusable artifact and joins on (band, bkey) only —
    * crawl text never re-shuffles against the corpus. The hv arrays
    * ride the ledger rows so verification is join-free. */
  def startNearDup(stream: DataFrame, idCol: String, textCol: String,
                   threshold: Double, corpusDir: String, bandsDir: String,
                   checkpointDir: String): StreamingQuery = {
    import graft.operators.MinHash
    // Band-ledger view across the drain — same scheme as [[start]]'s
    // digest ledger: disk is read at most once (first batch), each
    // batch extends the view with the survivor band rows it just
    // appended, and a restarted drain falls back to the disk read.
    var ledgerView: Option[Option[DataFrame]] = None
    val fn: (Dataset[Row], Long) => Unit = (batch, _) => {
      val spark = batch.sparkSession
      val frame = batch.toDF().localCheckpoint()
      val inBatch = frame
        .withColumn("content_hash", sha2(col(textCol), 256))
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("content_hash")).orderBy(col(idCol))))
        .where(col("__rn") === 1).drop("__rn", "content_hash")
      // Band the flush ONCE: the candidate join below and the
      // survivor ledger append both need the flush's band rows, and
      // re-deriving them re-ran the whole shingle→minhash signature a
      // second time per flush (guide §2.4). Signatures are a pure
      // per-doc function, so the survivor append can reuse these rows
      // via an id semi-join — row-identical to re-banding survivors.
      val bands = MinHash.bandRows(MinHash.signature(inBatch, idCol, textCol))
        .localCheckpoint()
      val ledger = ledgerView.getOrElse {
        val fromDisk = existingLedger(spark, bandsDir)
        ledgerView = Some(fromDisk)
        fromDisk
      }
      val nearDupIds = ledger match {
        case Some(l) =>
          val inter = graft.functions.SetOps
            .sortedIntersectCount(col("ha"), col("hb")).cast("double")
          val jac = inter / (size(col("ha")) + size(col("hb")) - inter)
          bands
            .join(l.select(col("band").as("__b"), col("bkey").as("__k"),
              col("hv").as("hb")),
              col("band") === col("__b") && col("bkey") === col("__k"))
            .select(col("doc_id"), col("hv").as("ha"), col("hb"))
            .where(jac >= threshold)
            .select(col("doc_id").as(idCol)).distinct()
        case None => spark.emptyDataFrame
          .withColumn(idCol, lit(null).cast("long"))
      }
      val survivors = inBatch
        .join(nearDupIds, Seq(idCol), "left_anti")
        .localCheckpoint()
      val survivorBands = bands
        .join(survivors.select(col(idCol).as("doc_id")),
          Seq("doc_id"), "left_semi")
        .select(col("band"), col("bkey"), col("hv"))
        .localCheckpoint() // consumed twice: the append AND the view
      survivorBands.write.mode(SaveMode.Append).parquet(bandsDir)
      survivors.write.mode(SaveMode.Append).parquet(corpusDir)
      ledgerView = Some(Some(ledger match {
        case Some(l) => l.unionByName(survivorBands)
        case None => survivorBands
      }))
    }
    stream.writeStream
      .foreachBatch(fn)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  private def existingLedger(spark: org.apache.spark.sql.SparkSession,
                             dir: String): Option[DataFrame] = {
    val d = new java.io.File(dir)
    if (d.isDirectory &&
      d.listFiles().exists(_.getName.endsWith(".parquet")))
      Some(spark.read.parquet(dir))
    else None
  }
}
