package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source duplication matrix — for every source pair, how many
  * DISTINCT contents appear in both (the provenance/licensing question
  * asked before mixing corpora: "how much of source A is already in
  * source B?", and the routing signal for which pairs deserve a
  * near-dup pass).
  *
  * Scale shape (the C1 digest discipline): text collapses to a 32-byte
  * sha256 AT THE SCAN, so document bodies never shuffle; the
  * (source, digest) distinct is one partial-agg shuffle; the pair
  * stage self-joins that deduplicated frame on the digest key, so a
  * digest held by s sources contributes s·(s−1)/2 pairs — bounded by
  * |sources|² per digest REGARDLESS of how many raw rows carried it
  * (the viral-document case collapses at the distinct). Per-source
  * distinct-content counts ride the same deduplicated frame; the
  * matrix is ≤ |sources|² rows, so the final joins broadcast.
  *
  * Output per unordered pair (source_a < source_b, only pairs with
  * shared > 0): shared distinct contents, each side's distinct-content
  * count, and the Jaccard overlap of the two content sets (exact
  * integer ratio rounded to 4 — deterministic cross-engine because
  * every operand is an exact BIGINT). */
object Provenance {

  /** The (source_a, source_b, shared, n_a, n_b, jaccard) matrix over
    * `df`. `srcCol` is any source/domain/provenance label column. */
  def sourceOverlap(df: DataFrame, srcCol: String, textCol: String): DataFrame = {
    val sd = df.select(col(srcCol).as("src"),
        sha2(col(textCol), 256).as("digest"))
      .distinct()
      .localCheckpoint() // three consumers: pair join sides + counts
    val counts = sd.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val pairs = sd.as("a").join(sd.as("b"),
        col("a.digest") === col("b.digest") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("source_a"), col("b.src").as("source_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(broadcast(counts).withColumnRenamed("src", "source_a")
        .withColumnRenamed("n", "n_a"), Seq("source_a"))
      .join(broadcast(counts).withColumnRenamed("src", "source_b")
        .withColumnRenamed("n", "n_b"), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("shared"),
        col("n_a"), col("n_b"),
        round(col("shared").cast("double")
          / (col("n_a") + col("n_b") - col("shared")).cast("double"), 4)
          .as("jaccard"))
  }

  /** DuckDB mirror of [[sourceOverlap]] — same digest-distinct, pair
    * join, and exact-integer Jaccard ladder. `table` may be any
    * relation expression exposing (`srcExpr`, `textExpr`). */
  def sourceOverlapSql(table: String, srcExpr: String,
                       textExpr: String): String =
    s"""WITH sd AS (
       |  SELECT DISTINCT $srcExpr AS src, sha256($textExpr) AS digest
       |  FROM $table),
       |counts AS (SELECT src, count(*) AS n FROM sd GROUP BY 1),
       |pairs AS (
       |  SELECT a.src AS source_a, b.src AS source_b, count(*) AS shared
       |  FROM sd a JOIN sd b ON a.digest = b.digest AND a.src < b.src
       |  GROUP BY 1, 2)
       |SELECT source_a, source_b, shared, ca.n AS n_a, cb.n AS n_b,
       |  round(CAST(shared AS DOUBLE)
       |    / CAST(ca.n + cb.n - shared AS DOUBLE), 4) AS jaccard
       |FROM pairs
       |JOIN counts ca ON ca.src = source_a
       |JOIN counts cb ON cb.src = source_b""".stripMargin
}
