package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}

/** Column-API wrappers for the native set/sketch expressions. */
object SetOps {

  /** Intersection size of two sorted distinct long arrays (codegen'd). */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** k minhash values of a long array in one pass (codegen'd). */
  def minhashArray(hv: Column, as: Seq[Long], bs: Seq[Long], p: Long): Column =
    GraftSqlBridge.column(MinHashArray(GraftSqlBridge.expression(hv), as, bs, p))

  /** Sorted distinct hashed word n-gram shingles (one compiled pass). */
  def shingleHashes(text: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleHashes(GraftSqlBridge.expression(text), n))

  /** Distinct word n-gram shingle strings (one compiled pass). */
  def shingleStrings(text: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleStrings(GraftSqlBridge.expression(text), n))

  /** One 32-bit simhash half over a token array (one compiled pass). */
  def simHashHalf(tokens: Column, byteOffset: Int): Column =
    GraftSqlBridge.column(SimHashHalf(GraftSqlBridge.expression(tokens), byteOffset))

  /** Winnowing fingerprints: sorted distinct w-window minima of the
    * positional n-gram hashes (one compiled pass). */
  def winnowFingerprints(text: Column, n: Int, w: Int): Column =
    GraftSqlBridge.column(WinnowFingerprints(
      GraftSqlBridge.expression(text), n, w))

  /** Character-distribution Shannon entropy (nats, e9-scaled long) in
    * one compiled pass — zero-shuffle per-row histogram (codegen'd). */
  def charEntropyE9(text: Column): Column =
    GraftSqlBridge.column(CharEntropyE9(GraftSqlBridge.expression(text)))

  /** Sequential greedy BPE merge passes over a token array — all
    * merges in one compiled pass per row (codegen'd). */
  def bpeMergeTokens(tokens: Column, merges: Seq[(String, String)],
                     joiner: String): Column =
    GraftSqlBridge.column(BpeMergeTokens(
      GraftSqlBridge.expression(tokens), merges, joiner))
}
