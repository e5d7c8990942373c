package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sfDir)
  private val spec = Seq("train" -> 80, "valid" -> 10, "test" -> 10)

  test("assignSplit: total coverage, determinism, roughly spec-shaped") {
    val split = Sampling.assignSplit(docs, "doc_id", spec).cache()
    val n = docs.count()
    // every doc gets exactly one label
    assert(split.count() === n)
    assert(split.where(col("split").isNull).count() === 0)
    // deterministic: re-running assigns identical labels
    val again = Sampling.assignSplit(docs, "doc_id", spec)
    assert(split.exceptAll(again).count() === 0)
    // fractions land near the spec (md5 is uniform; 500 docs → loose bounds)
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet === Set("train", "valid", "test"))
    assert(byLabel("train") > n / 2, s"train=${byLabel("train")} of $n")
    assert(byLabel("valid") < n / 4 && byLabel("test") < n / 4)
  }

  test("assignSplit: append-stable — old docs keep their split after a re-crawl grows the corpus") {
    val firstHalf = docs.where(col("doc_id") % 2 === 0)
    val small = Sampling.assignSplit(firstHalf, "doc_id", spec)
    val full = Sampling.assignSplit(docs, "doc_id", spec)
      .where(col("doc_id") % 2 === 0)
    assert(small.exceptAll(full).count() === 0)
    assert(full.exceptAll(small).count() === 0)
  }

  test("assignSplit rejects percentages that don't sum to 100") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(docs, "doc_id", Seq("a" -> 50, "b" -> 30))
    }
  }

  test("stratifiedSample: per-stratum rates honored, subset of input, deterministic") {
    val pct = Map("en" -> 20, "zh" -> 60)
    val sampled = Sampling.stratifiedSample(docs, "doc_id", "lang", pct, 40).cache()
    // sample ⊆ input
    assert(sampled.exceptAll(docs).count() === 0)
    // kept fraction per stratum tracks its rate (loose bounds, small n)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = sampled.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, total) <- totals if total >= 50) {
      val rate = kept.getOrElse(lang, 0L).toDouble / total
      val want = pct.getOrElse(lang, 40) / 100.0
      assert(math.abs(rate - want) < 0.15,
        s"$lang: kept ${kept.getOrElse(lang, 0L)}/$total=$rate, want ~$want")
    }
    // deterministic
    val again = Sampling.stratifiedSample(docs, "doc_id", "lang", pct, 40)
    assert(sampled.exceptAll(again).count() === 0)
  }

  test("budgetSelect: banded prefix sum equals the single-global-window " +
    "reference, including heavy score ties across band boundaries") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // synthetic scores engineered for ties and band-edge values
    val rows = (1L to 400L).map { id =>
      (id, (id % 7) + 1, math.rint(((id * 13) % 21) / 20.0 * 10000) / 10000)
    }
    val df = rows.toDF("doc_id", "n_tokens", "score")
    for (budget <- Seq(50L, 300L, 100000L); bands <- Seq(1, 5, 20)) {
      val got = Sampling.budgetSelect(df, "doc_id", "score", "n_tokens",
        budget, bands)
      val ref = df.withColumn("cum_weight",
          sum(col("n_tokens")).over(
            Window.orderBy(col("score").desc, col("doc_id"))))
        .where(col("cum_weight") <= budget)
      assert(got.select("doc_id", "cum_weight")
        .exceptAll(ref.select("doc_id", "cum_weight")).count() === 0
        && got.count() === ref.count(),
        s"budget=$budget bands=$bands")
    }
  }

  test("budgetSelectPerStratum: equals a per-stratum global window; " +
    "no stratum exceeds its budget") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val rows = (1L to 400L).map { id =>
      (id, "s" + (id % 5), (id % 7) + 1,
        math.rint(((id * 13) % 21) / 20.0 * 10000) / 10000)
    }
    val df = rows.toDF("doc_id", "stratum", "n_tokens", "score")
    for (budget <- Seq(30L, 200L, 100000L); bands <- Seq(1, 5, 20)) {
      val got = Sampling.budgetSelectPerStratum(df, "doc_id", "score",
        "n_tokens", "stratum", budget, bands)
      val ref = df.withColumn("cum_weight",
          sum(col("n_tokens")).over(Window.partitionBy(col("stratum"))
            .orderBy(col("score").desc, col("doc_id"))))
        .where(col("cum_weight") <= budget)
      assert(got.select("doc_id", "cum_weight")
        .exceptAll(ref.select("doc_id", "cum_weight")).count() === 0
        && got.count() === ref.count(),
        s"budget=$budget bands=$bands")
      val worst = got.groupBy("stratum")
        .agg(max(col("cum_weight")).as("m")).agg(max(col("m")))
        .first().getLong(0)
      assert(worst <= budget)
    }
  }

  test("topPctPerStratum: equals the per-stratum global-window rank rule " +
    "(ceil boundary, ties, every band count)") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // stratum sizes 80/81/79/80/80 → ceil exercises both boundary cases
    val rows = (1L to 400L).map { id =>
      (id, "s" + (id % 5),
        math.rint(((id * 13) % 21) / 20.0 * 10000) / 10000)
    }
    val df = rows.toDF("doc_id", "stratum", "score")
    for (pct <- Seq(1, 40, 99, 100); bands <- Seq(1, 5, 20)) {
      val got = Sampling.topPctPerStratum(df, "doc_id", "score",
        "stratum", pct, bands)
      val ref = df
        .withColumn("rk", row_number().over(Window.partitionBy(col("stratum"))
          .orderBy(col("score").desc, col("doc_id"))).cast("long"))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy(col("stratum"))))
        .where(col("rk") <= expr(s"CAST((n * $pct + 99) DIV 100 AS BIGINT)"))
      assert(got.select("doc_id").exceptAll(ref.select("doc_id")).count() === 0
        && got.count() === ref.count(), s"pct=$pct bands=$bands")
    }
    // keepPct=100 keeps everything
    assert(Sampling.topPctPerStratum(df, "doc_id", "score", "stratum", 100)
      .count() === 400)
  }

  test("weightedSample: fixed size, deterministic, weight-biased, no -inf keys") {
    val n = 100
    val s1 = Sampling.weightedSample(docs, "doc_id", col("n_chars"), n)
      .select("doc_id", "sel_key").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val s2 = Sampling.weightedSample(docs, "doc_id", col("n_chars"), n)
      .select("doc_id", "sel_key").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s1 == s2 && s1.size == n)
    assert(s1.values.forall(k => k <= 0.0 && !k.isNegInfinity))
    // A-Res with weight = n_chars must pull the sample's mean length
    // above the population's (deterministic given fixed data)
    val sampleMean = docs.where(col("doc_id").isin(s1.keys.toSeq: _*))
      .agg(avg("n_chars")).head.getDouble(0)
    val popMean = docs.agg(avg("n_chars")).head.getDouble(0)
    assert(sampleMean > popMean,
      s"sample mean $sampleMean not above population mean $popMean")
    // zero/negative weights clamp to 1 instead of producing -inf
    val clamped = Sampling.weightedSample(
      docs.withColumn("n_chars", lit(0L)), "doc_id", col("n_chars"), n)
    assert(clamped.count() === n
      && clamped.agg(min("sel_key")).head.getDouble(0) > -30.0)
  }

  test("bucket matches the portable md5-prefix rule (JVM reference)") {
    import java.security.MessageDigest
    val ids = docs.select("doc_id").limit(32).collect().map(_.getLong(0))
    val got = Sampling.assignSplit(docs.where(col("doc_id").isin(ids: _*)),
        "doc_id", spec)
      .withColumn("b", Sampling.bucket(col("doc_id"), 100))
      .select("doc_id", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (id <- ids) {
      val d = MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      assert(got(id) === h % 100, s"doc $id")
    }
  }

  test("epochShuffle: total permutation per shard, deterministic, " +
    "epochs decorrelated, shards balanced") {
    val n = docs.count()
    val e1 = Sampling.epochShuffle(docs, "doc_id", epoch = 1, nShards = 8)
      .cache()
    // every doc appears exactly once, with a dense 1..k position per shard
    assert(e1.count() === n)
    assert(e1.select("doc_id").distinct().count() === n)
    val dense = e1.groupBy("shard")
      .agg(count(lit(1)).as("k"), max("pos").as("mx"), min("pos").as("mn"))
    assert(dense.where(col("mx") =!= col("k") || col("mn") =!= 1)
      .count() === 0)
    // deterministic re-run
    val again = Sampling.epochShuffle(docs, "doc_id", epoch = 1, nShards = 8)
    assert(e1.exceptAll(again).count() === 0)
    // a different epoch reassigns most docs' (shard, pos): identical
    // rows between epochs should be rare (md5 decorrelates)
    val e2 = Sampling.epochShuffle(docs, "doc_id", epoch = 2, nShards = 8)
    assert(e1.intersect(e2).count() < n / 4)
    // md5 shards are roughly uniform (500 docs over 8 shards)
    val sizes = e1.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length === 8 && sizes.min > n / 16, sizes.mkString(","))
  }

  test("epochShuffle: append-stable shard, order-shift only — old docs " +
    "keep their shard when the corpus grows") {
    val half = docs.where(col("doc_id") % 2 === 0)
    val small = Sampling.epochShuffle(half, "doc_id", 1, 8)
      .select(col("doc_id"), col("shard"))
    val full = Sampling.epochShuffle(docs, "doc_id", 1, 8)
      .where(col("doc_id") % 2 === 0).select(col("doc_id"), col("shard"))
    assert(small.exceptAll(full).count() === 0)
  }

  test("epochPlan: cap/deficit identities and budget conservation") {
    import spark.implicits._
    // three strata: tiny (will cap), medium, huge (never caps)
    val df = (Seq.fill(2)("tiny") ++ Seq.fill(40)("med") ++
      Seq.fill(400)("big")).zipWithIndex
      .map { case (s, i) => (s, i.toLong) }.toDF("src", "id")
    val plan = Sampling.epochPlan(df, "src", lit(10L), alpha = 0.5,
      budget = 3000L, maxEpochs = 4).collect()
    assert(plan.length === 3)
    plan.foreach { r =>
      val (n, target, epochs, sampled, deficit) =
        (r.getLong(1), r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6))
      assert(epochs <= 4.0)
      assert(sampled + deficit === target)        // split identity
      assert(sampled <= 4 * n)                    // repeat cap
      assert(deficit === math.max(0L, target - 4 * n))
    }
    // targets sum to the budget up to the per-stratum floors
    val tsum = plan.map(_.getLong(3)).sum
    assert(tsum <= 3000L && tsum >= 3000L - plan.length)
    // the tiny stratum must actually cap under sqrt weighting
    val tiny = plan.find(_.getString(0) == "tiny").get
    assert(tiny.getLong(6) > 0L)
  }
}
