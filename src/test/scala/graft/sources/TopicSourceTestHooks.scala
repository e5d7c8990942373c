package graft.sources

import org.apache.spark.sql.types.StructType

/** Package-private reach-in for TopicSourceSpec (the stream class and
  * its memo hooks are private[sources] by design). */
object TopicSourceTestHooks {

  /** Opaque handle so the private stream type never escapes. */
  final class StreamHandle private[sources] (s: TopicMicroBatchStream) {
    def discover(): Map[Int, Long] = s.discoverEnds()
    def memoSize: Int = s.footerMemoSize
    /** Drive planInputPartitions directly (the coverage/self-heal path). */
    def plan(start: Map[Int, Long], end: Map[Int, Long]): Int =
      s.planInputPartitions(TopicOffset(start), TopicOffset(end)).length
  }

  def handle(schema: StructType, path: String): StreamHandle =
    new StreamHandle(new TopicMicroBatchStream(schema, path, Long.MaxValue))
}
