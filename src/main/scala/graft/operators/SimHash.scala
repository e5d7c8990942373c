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
  * RECALL CAP (pigeonhole honesty): `chunks` pieces GUARANTEE recall
  * only to hamming ≤ chunks-1. With the default four chunks a `maxDist`
  * of 4+ still returns pairs — near-dup bit flips cluster, so distance-4
  * pairs usually share a chunk — but a pair whose 4 differing bits land
  * in four DIFFERENT chunks is silently missed (pinned by DocsOpsSpec's
  * planted counterexample). The generated oracle applies the identical
  * candidate rule, so both engines agree; the cap is about recall vs an
  * exact all-pairs scan, not cross-engine parity. For guaranteed recall
  * at `maxDist` d pass `chunks = d+1`: the 5-chunk 13/13/13/13/12 split
  * guarantees d=4 (the planted counterexample above IS found at
  * chunks=5), at the cost of 25% more candidate rows per doc.
  *
  * All bit arithmetic is integer-only and the DuckDB oracle is generated
  * from the same bit positions ([[simhashOracleSql]]).
  */
object SimHash {

  val chunkMask = 0xFFFFL

  /** Bit ranges `(start, len)` (start = LSB offset into the 64-bit
    * simhash) for an n-way split, widest chunks at the top. n=4 yields
    * the classic 16-bit quarters; n=5 the 13/13/13/13/12 split that
    * guarantees hamming ≤ 4 recall. Both the Spark plan and the DuckDB
    * oracle derive their chunk-extraction arithmetic from THIS seq, so
    * the candidate rule can never diverge between engines. */
  def chunkRanges(chunks: Int): Seq[(Int, Int)] = {
    require(chunks >= 2 && chunks <= 64, s"chunks must be in [2,64], got $chunks")
    val base = 64 / chunks
    val extra = 64 % chunks // first `extra` chunks get one more bit
    val sizes = Seq.tabulate(chunks)(i => if (i < extra) base + 1 else base)
    sizes.scanLeft(64)((top, len) => top - len).zip(sizes).map {
      case (top, len) => (top - len, len)
    }
  }

  /** Spark-side extraction of bits [start, start+len) from the
    * (sim_hi, sim_lo) halves; handles ranges spanning the 32-bit seam. */
  private def chunkCol(start: Int, len: Int): Column = {
    val mask = (1L << len) - 1L
    if (start >= 32)
      shiftright(col("sim_hi"), start - 32).bitwiseAND(lit(mask))
    else if (start + len <= 32)
      shiftright(col("sim_lo"), start).bitwiseAND(lit(mask))
    else {
      val hiBits = start + len - 32
      shiftleft(col("sim_hi").bitwiseAND(lit((1L << hiBits) - 1L)), 32 - start)
        .bitwiseOR(shiftright(col("sim_lo"), start))
    }
  }

  /** DuckDB form of [[chunkCol]], from the same (start, len). */
  private def chunkSql(start: Int, len: Int): String = {
    val mask = (1L << len) - 1L
    if (start >= 32) s"((sim_hi >> ${start - 32}) & $mask)"
    else if (start + len <= 32) s"((sim_lo >> $start) & $mask)"
    else {
      val hiBits = start + len - 32
      s"(((sim_hi & ${(1L << hiBits) - 1L}) << ${32 - start}) | (sim_lo >> $start))"
    }
  }

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

  /** Pairs within `maxDist` hamming distance, candidates via the
    * `chunks`-way pigeonhole equi-join. Output: id_a, id_b, hamming.
    * Guaranteed-complete only for maxDist ≤ chunks-1 (see the recall cap
    * note on the object). */
  def hammingPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDist: Int, maxBucket: Int = 64,
                   chunks: Int = 4): DataFrame =
    pairsFromSignatures(signature(docs, idCol, textCol), maxDist, maxBucket,
      chunks)

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
                          maxBucket: Int = 64, chunks: Int = 4): DataFrame = {
    val exploded = sig.select(col("doc_id"), col("sim_hi"), col("sim_lo"),
      explode(array(chunkRanges(chunks).zipWithIndex.map {
        case ((start, len), i) =>
          struct(lit(i).as("chunk"), chunkCol(start, len).as("cval"))
      }: _*)).as("c"))
      .select(col("doc_id"), col("sim_hi"), col("sim_lo"),
        col("c.chunk").as("chunk"), col("c.cval").as("cval"))
    val smallBuckets = exploded.groupBy("chunk", "cval")
      .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBucket)
      .select("chunk", "cval")
    val capped = exploded.join(smallBuckets, Seq("chunk", "cval"), "left_semi")
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
  def simhashOracleSql(table: String, maxDist: Int, maxBucket: Int = 64,
                       chunks: Int = 4): String = {
    def majoritySql(hvCol: String): String =
      (0 until 32).map { j =>
        s"CASE WHEN 2*len(list_filter($hvCol, h -> ((h >> $j) & 1) = 1)) >= n THEN ${1L << j} ELSE 0 END"
      }.mkString("(", "\n        + ", ")")
    val chunkSelects = chunkRanges(chunks).zipWithIndex.map {
      case ((start, len), i) =>
        s"SELECT doc_id, sim_hi, sim_lo, $i AS chunk, ${chunkSql(start, len)} AS cval FROM sig"
    }.mkString("\n  UNION ALL ")
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
       |  $chunkSelects),
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
