package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins — the manual fallback when AQE's
  * runtime skew-split can't help (e.g. the skewed side feeds a window,
  * or the join key histogram is known up front).
  *
  * A shuffle equi-join hashes rows to `shuffle.partitions` reducers by
  * key; a viral key sends ALL its rows to one reducer, which then runs
  * as long as the whole rest of the stage. Salting splits each hot key
  * into `salts` sub-keys: the fact side appends a pseudorandom salt in
  * [0, salts), the dimension side replicates each row once per salt
  * value, and the join runs on (key, salt) — the hot key's rows now
  * spread over `salts` reducers at the cost of a `salts`× larger
  * dimension shuffle. Use when |dim| · salts ≪ |fact|'s hot keys.
  *
  * The salt is derived by hashing the fact row's full struct (not
  * `rand()`): deterministic across retries and replays, so a failed
  * stage recomputes identical partitions — required for exactly-once
  * sinks downstream. */
object Skew {

  /** Inner/left equi-join of `fact` with `dim` on `key`, salted
    * `salts` ways. Result rows are exactly those of the plain join. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(joinType == "inner" || joinType == "left",
      s"salted join supports inner/left, not $joinType")
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col).toIndexedSeq: _*)),
        lit(salts.toLong)))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
