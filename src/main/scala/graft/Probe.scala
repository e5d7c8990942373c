package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev tool: time individual pipeline stages of the near-dup operators. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $name ($n rows)")
    }
    // Query mode: `runMain graft.Probe <sfdir> q1,q2` times the named
    // SparkEntry queries (3 passes each, noop write like Bench);
    // SPARK_GRAFT_EXPLAIN=1 also dumps the formatted plan.
    if (args.length > 1) {
      val names = args(1).split(",").toSeq
      names.foreach { q =>
        if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
          SparkEntry.queries(q)(spark, sfDir).explain("formatted")
        (1 to 3).foreach { p =>
          // Rebuild inside the timer: streaming queries do their real
          // work (slice, drain) during construction, like Bench sees.
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          println(f"${(System.nanoTime() - t0) / 1e9}%8.2f s  $q pass $p")
        }
      }
      spark.stop()
      return
    }
    val docs = Tables.documents(spark, sfDir)
    import graft.operators.{Dedup, MinHash}
    // warmup
    docs.count()
    time("shingles only") {
      docs.select(col("doc_id"), operators.MinHash.shingles(col("text")).as("s"))
        .select(sum(size(col("s")))).first(); docs.count() }
    time("hashedShingles") {
      docs.select(col("doc_id"), MinHash.hashedShingles(col("text")).as("hv"))
        .select(sum(size(col("hv")))).first(); docs.count() }
    time("signature (hv+mh)") {
      MinHash.signature(docs, "doc_id", "text")
        .select(sum(size(col("mh")))).first(); docs.count() }
    time("bandRows") {
      MinHash.bandRows(MinHash.signature(docs, "doc_id", "text"))
        .select(count(lit(1))).first().getLong(0) }
    time("minhash full") {
      MinHash.neardupPairs(docs, "doc_id", "text", 0.5).count() }
    time("ngram sets") {
      docs.select(col("doc_id"), MinHash.hashedShingles(col("text"), 2).as("hv"))
        .select(sum(size(col("hv")))).first(); docs.count() }
    time("ngram full") {
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "source", 2, 0.05).count() }
    spark.stop()
  }
}
