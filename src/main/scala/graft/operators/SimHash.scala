package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash 64-bit near-duplicate fingerprints + hamming-distance pairs
  * (SURVEY.md §2.C3).
  *
  * The 64-bit simhash is carried as two 32-bit halves (`sim_hi`,
  * `sim_lo`) so every value stays positive and engine-portable. Candidate
  * pairs come from the classic pigeonhole trick: split the 64 bits into
  * four 16-bit chunks and equi-join on any identical chunk — a pair
  * within hamming distance 3 must share a chunk; near-dup texts share
  * most chunks. No n² comparison anywhere.
  *
  * RECALL CAP (pigeonhole honesty): four chunks GUARANTEE recall only to
  * hamming ≤ 3. A `maxDist` of 4+ still returns pairs — near-dup bit
  * flips cluster, so distance-4 pairs usually share a chunk — but a
  * pair whose 4 differing bits land in four DIFFERENT chunks is
  * silently missed (pinned by OperatorsSpec's planted counterexample).
  * The generated oracle applies the identical candidate rule, so both
  * engines agree; the cap is about recall vs an exact all-pairs scan,
  * not cross-engine parity. For guaranteed recall at `maxDist` d, use
  * d+1 chunks (a 5-chunk 12/13-bit split would guarantee d=4).
  *
  * All bit arithmetic is integer-only and the DuckDB oracle is generated
  * from the same bit positions ([[simhashOracleSql]]).
  */
object SimHash {

  val chunkMask = 0xFFFFL

  /** doc_id, n_tokens, sim_hi, sim_lo (each a 32-bit non-negative long).
    * Each half is one compiled pass over the distinct tokens
    * ([[graft.functions.SimHashHalf]]) — the declarative form (64 ×
    * interpreted `filter` HOFs per row) was the operator's entire cost. */
  def signature(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = array_distinct(split(col(textCol), " "))
    docs
      .select(col(idCol).as("doc_id"), toks.as("tk"))
      .select(
        col("doc_id"),
        size(col("tk")).cast("long").as("n_tokens"),
        graft.functions.SetOps.simHashHalf(col("tk"), 0).as("sim_hi"),
        graft.functions.SetOps.simHashHalf(col("tk"), 4).as("sim_lo"))
  }

  /** Pairs within `maxDist` hamming distance, candidates via the 16-bit
    * chunk pigeonhole equi-join. Output: id_a, id_b, hamming.
    * Guaranteed-complete only for maxDist ≤ 3 (see the recall cap note
    * on the object). */
  def hammingPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int, maxBucket: Int = 64): DataFrame =
    pairsFromSignatures(signature(docs, idCol, textCol), maxDist, maxBucket)

  /** [[hammingPairs]] over precomputed signatures (doc_id, sim_hi,
    * sim_lo) — the candidate-generation core, exposed so the pigeonhole
    * recall properties can be pinned on planted signatures.
    *
    * `maxBucket` is the hot-bucket guard: chunk values shared by more
    * than `maxBucket` docs are dropped from candidate generation (they
    * carry no near-dup discrimination — the LSH "stop bucket" trick).
    * Without it a popular chunk value makes the self-join quadratic: at
    * sf0.1 one bucket holds 1473 of 5000 docs = 1M of 1.9M candidate
    * pairs; capped at 64 the volume drops to 73k and scales linearly
    * with the corpus. At 100 TB this cap is the difference between a
    * bounded equi-join and n². */
  def pairsFromSignatures(sig: DataFrame, maxDist: Int,
                          maxBucket: Int = 64): DataFrame = {
    val chunks = sig.select(col("doc_id"), col("sim_hi"), col("sim_lo"),
      explode(array(
        struct(lit(0).as("chunk"), shiftright(col("sim_hi"), 16).as("cval")),
        struct(lit(1).as("chunk"), col("sim_hi").bitwiseAND(lit(chunkMask)).as("cval")),
        struct(lit(2).as("chunk"), shiftright(col("sim_lo"), 16).as("cval")),
        struct(lit(3).as("chunk"), col("sim_lo").bitwiseAND(lit(chunkMask)).as("cval"))
      )).as("c"))
      .select(col("doc_id"), col("sim_hi"), col("sim_lo"),
        col("c.chunk").as("chunk"), col("c.cval").as("cval"))
    val smallBuckets = chunks.groupBy("chunk", "cval")
      .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBucket)
      .select("chunk", "cval")
    val capped = chunks.join(smallBuckets, Seq("chunk", "cval"), "left_semi")
    val hamming =
      bit_count(col("x.sim_hi").bitwiseXOR(col("y.sim_hi"))).cast("long") +
        bit_count(col("x.sim_lo").bitwiseXOR(col("y.sim_lo"))).cast("long")
    capped.as("x").join(capped.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cval") === col("y.cval")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        hamming.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }

  /** DuckDB oracle for [[hammingPairs]], generated from the same bit
    * positions and chunking. */
  def simhashOracleSql(table: String, maxDist: Int, maxBucket: Int = 64): String = {
    def majoritySql(hvCol: String): String =
      (0 until 32).map { j =>
        s"CASE WHEN 2*len(list_filter($hvCol, h -> ((h >> $j) & 1) = 1)) >= n THEN ${1L << j} ELSE 0 END"
      }.mkString("(", "\n        + ", ")")
    s"""WITH tk AS (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS t FROM $table),
       |hv AS (
       |  SELECT doc_id, len(t) AS n,
       |         list_transform(t, x -> ('0x'||substr(md5(x),1,8))::BIGINT) AS h_hi,
       |         list_transform(t, x -> ('0x'||substr(md5(x),9,8))::BIGINT) AS h_lo
       |  FROM tk),
       |sig AS (
       |  SELECT doc_id,
       |    ${majoritySql("h_hi")} AS sim_hi,
       |    ${majoritySql("h_lo")} AS sim_lo
       |  FROM hv),
       |chunks AS (
       |  SELECT doc_id, sim_hi, sim_lo, 0 AS chunk, sim_hi >> 16 AS cval FROM sig
       |  UNION ALL SELECT doc_id, sim_hi, sim_lo, 1, sim_hi & $chunkMask FROM sig
       |  UNION ALL SELECT doc_id, sim_hi, sim_lo, 2, sim_lo >> 16 FROM sig
       |  UNION ALL SELECT doc_id, sim_hi, sim_lo, 3, sim_lo & $chunkMask FROM sig),
       |small AS (
       |  SELECT chunk, cval FROM chunks
       |  GROUP BY 1, 2 HAVING count(*) <= $maxBucket),
       |capped AS (
       |  SELECT c.* FROM chunks c JOIN small USING (chunk, cval)),
       |pairs AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b,
       |    CAST(bit_count(xor(x.sim_hi, y.sim_hi)) AS BIGINT)
       |      + CAST(bit_count(xor(x.sim_lo, y.sim_lo)) AS BIGINT) AS hamming
       |  FROM capped x JOIN capped y
       |    ON x.chunk = y.chunk AND x.cval = y.cval AND x.doc_id < y.doc_id)
       |SELECT id_a, id_b, hamming FROM pairs
       |WHERE hamming <= $maxDist ORDER BY id_a, id_b""".stripMargin
  }
}
