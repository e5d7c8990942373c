package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.cdc.{Changelog, PipedTransform}

/** Plugin resource sandboxing (the RFC's future-work item,
  * README.md:125): FAILFAST→DLQ isolates a plugin's failures; the
  * guarded runner bounds its RESOURCE USE — a hung, amplifying, or
  * line-bombing plugin must fail the task LOUDLY and promptly, never
  * wedge the feed or OOM the executor. */
class PipedGuardSpec extends SparkSpec {

  private lazy val log = Changelog.fromEvents(Tables.events(spark, sfDir))
    .limit(200).cache()

  private val outDdl = "seq BIGINT, key BIGINT, tag STRING"

  private val goodScript =
    """import sys, json
      |for line in sys.stdin:
      |    r = json.loads(line)
      |    print(json.dumps({"seq": r["seq"], "key": r["key"],
      |                      "tag": "py:%d" % (r["key"] % 10)}))
      |""".stripMargin

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil
    else String.valueOf(t.getMessage) +: messages(t.getCause)

  test("guarded runner ≡ engine pipe for a well-behaved plugin") {
    val cmd = Seq("python3", "-u", "-c", goodScript)
    val schema = StructType.fromDDL(outDdl)
    val a = PipedTransform.transform(cmd, schema)(log)
      .orderBy("seq").collect().toSeq
    val b = PipedTransform.guarded(cmd, schema)(log)
      .orderBy("seq").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("output amplification beyond the cap kills the plugin loudly") {
    val bomb =
      """import sys, json
        |for line in sys.stdin:
        |    r = json.loads(line)
        |    for i in range(1000):
        |        print(json.dumps({"seq": r["seq"], "key": i, "tag": "x"}))
        |""".stripMargin
    val e = intercept[Throwable] {
      PipedTransform.guarded(Seq("python3", "-u", "-c", bomb),
        StructType.fromDDL(outDdl),
        limits = PipedTransform.Limits(maxOutputRowsPerInput = 5))(log)
        .count()
    }
    assert(messages(e).exists(_.contains("amplification")), messages(e))
  }

  test("a hung plugin trips the idle timeout instead of wedging the feed") {
    val hang =
      """import sys, time
        |sys.stdin.readline()
        |time.sleep(600)
        |""".stripMargin
    val t0 = System.nanoTime()
    val e = intercept[Throwable] {
      PipedTransform.guarded(Seq("python3", "-u", "-c", hang),
        StructType.fromDDL(outDdl),
        limits = PipedTransform.Limits(idleTimeoutSec = 2))(log)
        .count()
    }
    val secs = (System.nanoTime() - t0) / 1e9
    assert(messages(e).exists(_.contains("idle timeout")), messages(e))
    assert(secs < 60, s"timeout took ${secs}s — the guard didn't bound it")
  }

  test("an abandoned iterator (downstream limit) kills the plugin " +
    "process — no zombie per abandoned partition") {
    val marker =
      "graftmark" + java.util.UUID.randomUUID.toString.replace("-", "")
    val echo =
      s"""import sys, json
         |MARKER = "$marker"
         |for line in sys.stdin:
         |    r = json.loads(line)
         |    print(json.dumps({"seq": r["seq"], "key": r["key"],
         |                      "tag": "t"}))
         |""".stripMargin
    val got = PipedTransform.guarded(Seq("python3", "-u", "-c", echo),
      StructType.fromDDL(outDdl))(log).limit(1).collect()
    assert(got.length === 1)
    def alive(): Boolean = {
      import scala.jdk.StreamConverters._
      ProcessHandle.allProcesses().toScala(Seq).exists(p =>
        p.info().commandLine()
          .map[Boolean](_.contains(marker)).orElse(false))
    }
    // the TaskCompletionListener fires as the limit-satisfied task ends
    val deadline = System.nanoTime() + 15L * 1000000000L
    while (alive() && System.nanoTime() < deadline) Thread.sleep(100)
    assert(!alive(),
      "plugin process leaked after the task abandoned the iterator")
  }

  test("a line bomb trips the per-line byte cap before it can OOM") {
    val lineBomb =
      """import sys
        |sys.stdin.readline()
        |sys.stdout.write('{"seq":1,"key":1,"tag":"' + 'x' * 3000000 + '"}\n')
        |sys.stdout.flush()
        |""".stripMargin
    val e = intercept[Throwable] {
      PipedTransform.guarded(Seq("python3", "-u", "-c", lineBomb),
        StructType.fromDDL(outDdl),
        limits = PipedTransform.Limits(maxLineBytes = 1 << 20))(log)
        .count()
    }
    assert(messages(e).exists(_.contains("exceeds")), messages(e))
  }
}
