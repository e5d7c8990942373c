package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-token-budget training
  * shards ("concat the corpus, chop every `budgetTokens`"), the step
  * between a cleaned corpus and a pretraining dataloader.
  *
  * Scale shape: a single global concat order would be one task sorting
  * 100 TB, so packing is bucketed — docs hash into `numBuckets`
  * independent packing groups ([[Sampling.bucket]] on the id: stable,
  * engine-portable), and each bucket packs in deterministic doc-id
  * order via a window PARTITIONED by bucket. At scale, buckets ≫
  * cores → every executor packs its buckets independently; shard ids
  * are (bucket, shard) pairs so no cross-bucket coordination exists.
  * The trade vs global packing: each bucket wastes at most one
  * under-full tail shard — negligible when buckets hold many budgets'
  * worth of tokens.
  *
  * Tokens are whitespace-token counts (the same portable tokenizer as
  * `doc_token_count`); a doc longer than the budget still lands in one
  * shard (real pipelines split it upstream — shard token sums are
  * bounded by budget + max doc tokens, asserted in PackingSpec). */
object Packing {

  /** Per-doc shard assignment: (doc_id, bucket, n_tokens, start_tok,
    * shard) where `start_tok` is the doc's token offset inside its
    * bucket's concat stream and `shard = floor(start_tok / budget)`. */
  def assignShards(docs: DataFrame, idCol: String, textCol: String,
                   numBuckets: Int, budgetTokens: Int): DataFrame = {
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
    docs
      .withColumn("bucket", Sampling.bucket(col(idCol), numBuckets))
      .withColumn("n_tokens",
        size(split(col(textCol), " ")).cast("long"))
      .withColumn("start_tok",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("shard",
        floor(col("start_tok") / lit(budgetTokens.toDouble)).cast("long"))
      .select(col(idCol), col("bucket"), col("n_tokens"),
        col("start_tok"), col("shard"))
  }

  /** DuckDB form of [[assignShards]] — same bucket rule, same window,
    * same floor; generated from the same constants. */
  def oracleSql(table: String, id: String, text: String,
                numBuckets: Int, budgetTokens: Int): String = {
    val bucket = Sampling.bucketSql(id, numBuckets)
    // fragments substituted post-stripMargin, single pass (ADVICE r8)
    graft.SqlTemplate.fill(s"""WITH toks AS (
       |  SELECT __ID__, __BUCKET__ AS bucket,
       |         len(string_split(__TEXT__, ' '))::BIGINT AS n_tokens
       |  FROM __TABLE__),
       |offs AS (
       |  SELECT *, sum(n_tokens) OVER (
       |      PARTITION BY bucket ORDER BY __ID__
       |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start_tok
       |  FROM toks)
       |SELECT __ID__, bucket, n_tokens, CAST(start_tok AS BIGINT) AS start_tok,
       |       CAST(floor(start_tok / $budgetTokens.0) AS BIGINT) AS shard
       |FROM offs
       |ORDER BY bucket, start_tok""".stripMargin,
      "__ID__" -> id, "__TEXT__" -> text, "__TABLE__" -> table,
      "__BUCKET__" -> bucket)
  }
}
