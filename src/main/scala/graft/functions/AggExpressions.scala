package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded per-group top-k as a native aggregate
  * ([[TypedImperativeAggregate]]) — the third Catalyst extension point
  * after scalar kernels (TextExpressions) and the DSv2 source
  * (GenSource): `groupBy(key).agg(graft_topk(x, k))` keeps the k
  * largest longs per group in a fixed-size buffer with map-side
  * partial aggregation, where the window-rank formulation
  * (`row_number() over (partition by key order by x desc) <= k`)
  * shuffles EVERY row to its group's reducer and sorts the full group.
  * At 100 TB: shuffled bytes ~ |groups|·k, not |rows| — the same
  * partial-agg argument as the repo's max_by snapshot.
  *
  * State: a size-(k+1) long array used as a binary min-heap of the
  * current top-k (root = smallest kept → O(log k) insert, O(1) reject
  * of values below the bar). Output: the k values sorted DESCENDING
  * (ties keep duplicates; deterministic — longs have no merge-order
  * residue). Serialization is a flat little-endian long vector. */
case class BoundedTopK(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BoundedTopK.Heap] {

  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_topk needs a BIGINT input, got $other")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): BoundedTopK.Heap =
    new BoundedTopK.Heap(k)

  override def update(buf: BoundedTopK.Heap, input: InternalRow): BoundedTopK.Heap = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BoundedTopK.Heap, b: BoundedTopK.Heap): BoundedTopK.Heap = {
    var i = 0
    while (i < b.size) { a.offer(b.values(i)); i += 1 }
    a
  }

  override def eval(buf: BoundedTopK.Heap): Any =
    new GenericArrayData(buf.sortedDesc)

  override def serialize(buf: BoundedTopK.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.values(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BoundedTopK.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val h = new BoundedTopK.Heap(k)
    var i = 0
    while (i < n) { h.offer(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedTopK =
    copy(child = newChildren.head)
}

object BoundedTopK {

  /** Fixed-capacity min-heap over longs (root = smallest kept). */
  final class Heap(k: Int) extends Serializable {
    val values = new Array[Long](k)
    var size = 0

    def offer(v: Long): Unit = {
      if (size < k) {
        // grow: bubble up
        var i = size
        values(i) = v
        size += 1
        while (i > 0 && values((i - 1) / 2) > values(i)) {
          val p = (i - 1) / 2
          val t = values(p); values(p) = values(i); values(i) = t
          i = p
        }
      } else if (v > values(0)) {
        // replace root, sift down
        values(0) = v
        var i = 0
        var done = false
        while (!done) {
          val l = 2 * i + 1
          val r = 2 * i + 2
          var m = i
          if (l < size && values(l) < values(m)) m = l
          if (r < size && values(r) < values(m)) m = r
          if (m == i) done = true
          else {
            val t = values(m); values(m) = values(i); values(i) = t
            i = m
          }
        }
      }
    }

    def sortedDesc: Array[Long] =
      values.take(size).sorted(Ordering.Long.reverse)
  }
}
