package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-token-window chunking and chunk-level (paragraph-level)
  * deduplication — the step between document-level curation and a
  * context-window-sized dataloader, and the standard weapon against
  * boilerplate that repeats ACROSS documents (headers, footers,
  * licence blocks) which document-level exact/near dedup cannot see.
  *
  * Scale shape: chunking is a scan-local `posexplode` projection — no
  * shuffle, each doc expands to ceil(tokens/stride) rows independently.
  * Chunk dedup shuffles only (digest, id, chunk_idx) triples — the
  * chunk TEXT is dropped before the exchange, so at 100 TB the shuffle
  * carries ~24-byte rows, never content. Keeper choice is the min
  * (id, chunk_idx) per digest via one window partitioned by digest
  * (cardinality ~ |chunks| — massively parallel, never a global sort).
  */
object Chunking {

  /** Explode each document into fixed-size token windows.
    * Output: (idCol, chunk_idx, n_tokens, chunk_text) — one row per
    * window of `chunkTokens` whitespace tokens starting every `stride`
    * tokens (stride < chunkTokens ⇒ overlapping windows; the tail
    * window may be short). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be > 0")
    docs
      .select(col(idCol), split(col(textCol), " ").as("__toks"))
      .select(col(idCol),
        posexplode(sequence(lit(0), size(col("__toks")) - 1,
          lit(stride))).as(Seq("chunk_idx", "__start")),
        col("__toks"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("__toks"), col("__start") + 1, lit(chunkTokens)).as("__c"))
      .select(col(idCol), col("chunk_idx"),
        size(col("__c")).cast("long").as("n_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** DuckDB mirror of [[chunk]] (same windows, same tail handling). */
  def chunkSql(table: String, id: String, text: String,
               chunkTokens: Int, stride: Int): String =
    s"""SELECT $id, chunk_idx, n_tokens, chunk_text FROM (
       |  SELECT $id,
       |    CAST(s.i // $stride AS BIGINT) AS chunk_idx,
       |    len(list_slice(t, s.i + 1, s.i + $chunkTokens))::BIGINT AS n_tokens,
       |    array_to_string(list_slice(t, s.i + 1, s.i + $chunkTokens), ' ')
       |      AS chunk_text
       |  FROM (SELECT $id, string_split($text, ' ') AS t FROM $table),
       |       LATERAL (SELECT unnest(generate_series(0, len(t) - 1, $stride))
       |                AS i) s)""".stripMargin

  /** Chunk-level exact dedup: every window of `chunkTokens` tokens is
    * digested ([[MinHash.hash32]] — the engine-portable md5 prefix) and
    * the FIRST occurrence (min doc id, then min chunk_idx) is the
    * keeper; later occurrences are flagged `is_dup`. Downstream either
    * drops duplicate chunks or aggregates `is_dup` into a per-doc
    * boilerplate fraction.
    *
    * Output: (idCol, chunk_idx, digest, is_dup), one row per chunk. */
  def dedupChunks(docs: DataFrame, idCol: String, textCol: String,
                  chunkTokens: Int, stride: Int): DataFrame = {
    val chunks = chunk(docs, idCol, textCol, chunkTokens, stride)
      .select(col(idCol), col("chunk_idx"),
        MinHash.hash32(col("chunk_text")).as("digest"))
    val w = Window.partitionBy(col("digest"))
      .orderBy(col(idCol), col("chunk_idx"))
    chunks
      .withColumn("is_dup", row_number().over(w) > 1)
      .select(col(idCol), col("chunk_idx"), col("digest"), col("is_dup"))
  }

  /** DuckDB mirror of [[dedupChunks]] — same digest, same keeper rule. */
  def dedupChunksSql(table: String, id: String, text: String,
                     chunkTokens: Int, stride: Int): String =
    s"""SELECT $id, chunk_idx,
       |  ('0x' || substr(md5(chunk_text), 1, 8))::BIGINT AS digest,
       |  row_number() OVER (
       |    PARTITION BY ('0x' || substr(md5(chunk_text), 1, 8))::BIGINT
       |    ORDER BY $id, chunk_idx) > 1 AS is_dup
       |FROM (${chunkSql(table, id, text, chunkTokens, stride)})""".stripMargin
}
