package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE-style merge learning over token sequences — the
  * tokenizer-training primitive (Sennrich et al. 2016). Works on any
  * symbol sequence; the repo's demo learns word-pair ("phrase")
  * merges over the documents table, which exercises the identical
  * algorithm with short arrays.
  *
  * Scale shape, per merge iteration (the Lloyd's-iteration pattern the
  * repo already uses for KMeans): adjacent-pair extraction is
  * scan-local (two slices + arrays_zip + explode — no window, no
  * join), pair counting is one combine-friendly groupBy, and the
  * argmax is a 1-row `orderBy(...).first()` to the driver — the only
  * driver touch, inherent to the sequential-merge definition. The
  * merge application is a scan-local higher-order fold; the corpus
  * is localCheckpoint'ed per iteration so lineage stays flat. N
  * merges = N (scan + light shuffle) rounds, each shuffle carrying
  * |vocab|² counts, not corpus rows.
  *
  * Determinism: the winning pair breaks count ties on (left, right)
  * lexicographic order, so the merge sequence is a pure function of
  * the corpus. */
object Bpe {

  /** Joiner for merged symbols (visible, not in the corpus alphabet). */
  val Joiner = "+"

  /** Adjacent-pair counts over a token-array column — the count step
    * of one BPE iteration. Output: (left, right, cnt). */
  def pairCounts(docs: DataFrame, tokCol: String): DataFrame = {
    val a = col(tokCol)
    val n1 = greatest(size(a) - 1, lit(0))
    val pairs = arrays_zip(slice(a, lit(1), n1), slice(a, lit(2), n1))
    docs
      .select(explode(pairs).as("p"))
      .select(col("p.0").as("left"), col("p.1").as("right"))
      .groupBy("left", "right").agg(count(lit(1)).as("cnt"))
  }

  /** DuckDB mirror of [[pairCounts]] over a text column split on
    * spaces. */
  def pairCountsSql(table: String, text: String): String =
    s"""WITH arr AS (SELECT string_split($text, ' ') AS a FROM $table),
       |toks AS (
       |  SELECT a, generate_subscripts(a, 1) AS pos, unnest(a) AS tok
       |  FROM arr),
       |pairs AS (
       |  SELECT a[pos] AS "left", a[pos + 1] AS "right"
       |  FROM toks WHERE pos < len(a))
       |SELECT "left", "right", count(*) AS cnt
       |FROM pairs GROUP BY 1, 2""".stripMargin

  /** One greedy left-to-right merge pass of (`l`, `r`) → `l+J+r` over
    * a token array, as a scan-local fold (no UDF): "a a a" under
    * (a, a) becomes ["a+a", "a"], like sentencepiece/GPT-2 BPE. */
  def applyMerge(tokCol: Column, l: String, r: String): Column = {
    val merged = lit(l + Joiner + r)
    // acc: struct(out ARRAY, pending STRING) — pending holds a token
    // that may still start a merge with the next symbol.
    val step = (acc: Column, x: Column) => {
      val out = acc.getField("out")
      val pending = acc.getField("pending")
      when(pending === lit(l) && x === lit(r),
        struct(concat(out, array(merged)).as("out"),
          lit(null).cast("string").as("pending")))
        .otherwise(struct(
          when(pending.isNull, out)
            .otherwise(concat(out, array(pending))).as("out"),
          x.as("pending")))
    }
    val z = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pending"))
    val fin = (acc: Column) =>
      when(acc.getField("pending").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"),
          array(acc.getField("pending"))))
    aggregate(tokCol, z, step, fin)
  }

  /** Learn `nMerges` merges from `docs(textCol)` (whitespace symbols).
    * Returns the merge sequence most-frequent-first; stops early if no
    * pair reaches `minCount`. */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  minCount: Long = 2L): Seq[(String, String)] = {
    var cur = docs.select(split(col(textCol), " ").as("toks"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String)]
    var i = 0
    var go = true
    while (i < nMerges && go) {
      val top = pairCounts(cur, "toks")
        .orderBy(desc("cnt"), col("left"), col("right"))
        .limit(1).collect()
      top.headOption.filter(_.getLong(2) >= minCount) match {
        case Some(row) =>
          val (l, r) = (row.getString(0), row.getString(1))
          merges += ((l, r))
          val next = cur.select(graft.functions.SetOps
              .bpeMergeTokens(col("toks"), Seq((l, r)), Joiner).as("toks"))
            .localCheckpoint()
          cur.unpersist()
          cur = next
        case None => go = false
      }
      i += 1
    }
    merges.result()
  }

  /** Tokenize with a learned merge sequence: apply each merge in
    * order, greedy left-to-right — the inference-side pass. All merges
    * run in ONE compiled kernel pass per row
    * ([[graft.functions.BpeMergeTokens]] — the declarative
    * [[applyMerge]] fold is semantically identical, BpeSpec-pinned,
    * but runs interpreted: ~15 s vs ~1 s for six merges at sf0.1). */
  def tokenize(docs: DataFrame, textCol: String,
               merges: Seq[(String, String)]): DataFrame =
    docs.withColumn("bpe_tokens", graft.functions.SetOps
      .bpeMergeTokens(split(col(textCol), " "), merges, Joiner))

  /** DuckDB mirror of `learnMerges(n) + tokenize`: n unrolled
    * learn+apply rounds over a PARENTHESIZED token representation —
    * "(a)(b)(c)" — where plain left-to-right non-overlapping
    * `replace('(l)(r)' → '(l+r)')` is exactly [[applyMerge]]'s greedy
    * fold (adjacent matches never share boundary characters, so
    * "a a a a" under (a,a) merges to two pairs in both engines).
    * Requires `(`, `)`, [[Joiner]] absent from the corpus alphabet. */
  def encodeSql(table: String, idCol: String, textCol: String,
                nMerges: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH r0 AS (
         |  SELECT $idCol AS doc_id,
         |         '(' || replace($textCol, ' ', ')(') || ')' AS rep
         |  FROM $table)""".stripMargin)
    for (i <- 0 until nMerges) {
      sb.append(
        s""",
           |t$i AS (
           |  SELECT doc_id, rep,
           |         string_split(substring(rep, 2, length(rep) - 2),
           |                      ')(') AS lst
           |  FROM r$i),
           |p$i AS (
           |  SELECT lst[pos] AS l, lst[pos + 1] AS r, count(*) AS cnt
           |  FROM (SELECT lst, generate_subscripts(lst, 1) AS pos FROM t$i)
           |  WHERE pos < len(lst) GROUP BY 1, 2),
           |m$i AS (SELECT l, r FROM p$i ORDER BY cnt DESC, l, r LIMIT 1),
           |r${i + 1} AS (
           |  SELECT doc_id,
           |         replace(rep, '(' || l || ')(' || r || ')',
           |                 '(' || l || '$Joiner' || r || ')') AS rep
           |  FROM t$i, m$i)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT doc_id,
         |       len(string_split(substring(rep, 2, length(rep) - 2),
         |                        ')(')) AS n_tokens,
         |       replace(substring(rep, 2, length(rep) - 2), ')(', ' ')
         |         AS bpe_text
         |FROM r$nMerges""".stripMargin)
    sb.toString
  }
}
