package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Out-of-process plugin transforms (reference README.md:44-48 — the
  * multi-language plugin runner: plugins in "whatever language the
  * user has", added without rebuilding the pipeline).
  *
  * Spark-first, the process boundary is `RDD.pipe` — the engine's
  * native external-process operator (the Hadoop-Streaming shape): one
  * process PER PARTITION, rows streamed over stdin/stdout as JSON
  * lines. That is the production contract for a sidecar plugin:
  *
  *  - '''distributed''' — the process runs on the executor beside each
  *    partition; no driver round-trip, no collect;
  *  - '''language-free''' — anything that reads/writes JSON lines
  *    plugs in (the spec drives `python3 -c`); deploying a new plugin
  *    is a registry call ([[ChainConfig.registerTransform]]) naming a
  *    command — the pipeline is never recompiled;
  *  - '''schema-checked''' — the declared `outputSchema` parses each
  *    output line (`from_json`); in strict mode a malformed line
  *    throws IN-PLAN (FAILFAST parse mode), which the streaming DLQ
  *    path ([[graft.streaming.CdcStream.deliverWithDlq]]) turns into a
  *    quarantined micro-batch instead of a wedged feed — the RFC's "a
  *    bad plugin must not crash the feed";
  *  - '''cost honesty''' — rows serialize to JSON and back and leave
  *    the JVM: this is for logic that genuinely needs a foreign
  *    runtime. A `sql:`/`transform:` JVM stage fuses into one Catalyst
  *    plan and is strictly faster when expressible.
  */
object PipedTransform {

  /** Build the `DataFrame => DataFrame` transform. `cmd` is the
    * executor-side command (e.g. `Seq("python3", "-u", "-c", src)`);
    * `outputSchema` is the DDL of the lines the process emits. */
  def transform(cmd: Seq[String], outputSchema: StructType,
                strict: Boolean = true)(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    parseLines(spark.createDataset(df.toJSON.rdd.pipe(cmd)),
      outputSchema, strict)
  }

  /** Declared-schema re-typing of plugin output lines — shared by every
    * out-of-process runner ([[PipedTransform]], [[HttpTransform]]). */
  private[cdc] def parseLines(lines: org.apache.spark.sql.Dataset[String],
                              outputSchema: StructType,
                              strict: Boolean): DataFrame = {
    if (strict) {
      // FAILFAST: an unparseable plugin line throws in-plan, so the
      // streaming DLQ path quarantines the micro-batch (PERMISSIVE
      // would silently yield a row of nulls — worse than failing).
      lines.select(from_json(col("value"), outputSchema,
          Map("mode" -> "FAILFAST")).as("__r"))
        .select(col("__r.*"))
    } else {
      // Lenient: drop lines that parse to nothing (malformed input
      // yields an all-null row under PERMISSIVE).
      val parsed = lines.select(
        from_json(col("value"), outputSchema).as("__r"))
      val anyField = outputSchema.fieldNames
        .map(f => col(s"__r.$f").isNotNull)
        .reduce(_ || _)
      parsed.where(col("__r").isNotNull && anyField).select(col("__r.*"))
    }
  }

  /** Register under `name` so chain configs reference `transform:name`
    * — config-driven, no recompilation (README.md:44-48). */
  def register(name: String, cmd: Seq[String], outputDdl: String,
               strict: Boolean = true): Unit =
    ChainConfig.registerTransform(name,
      transform(cmd, StructType.fromDDL(outputDdl), strict))
}
