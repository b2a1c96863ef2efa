package graft.functions.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-group exact top-k as a NATIVE aggregate: `topk_agg(v, k)`
  * returns the k largest long values of the group, sorted
  * descending.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION
  * BY g ORDER BY v)` must SHUFFLE AND SORT every row of every group
  * to rank them; this aggregate carries a bounded k-element min-heap
  * per group through the normal two-phase hash aggregate — partial
  * heaps on the map side, heap MERGE on the reduce side — so the
  * exchange moves at most k longs per (group, partition) instead of
  * the whole fact. The window form (`operators.TopK.direct`) remains
  * the right tool when the full ranked rows are needed; this is the
  * right tool when only the top VALUES are (leaderboards, threshold
  * calibration, per-key percentile caps).
  *
  * Output is the top-k MULTISET in a total (descending) order, so
  * the result is partitioning-independent even with duplicate
  * values — which is what makes the q213 gate hash-oracle-able.
  * Nulls are ignored (SQL aggregate semantics); an all-null group
  * yields an empty array.
  */
case class TopKAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Long]]
  with ImplicitCastInputTypes with UnaryLike[Expression] {

  require(k >= 1, s"topk_agg: k must be positive, got $k")

  override def prettyName: String = "topk_agg"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def inputTypes: Seq[DataType] = Seq(LongType)

  // min-heap: head is the smallest retained value — the eviction
  // candidate
  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long](Ordering[Long].reverse)

  private def offer(heap: mutable.PriorityQueue[Long], v: Long): Unit = {
    if (heap.size < k) heap.enqueue(v)
    else if (v > heap.head) { heap.dequeue(); heap.enqueue(v) }
  }

  override def update(
      heap: mutable.PriorityQueue[Long],
      input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) offer(heap, v.asInstanceOf[Long])
    heap
  }

  override def merge(
      heap: mutable.PriorityQueue[Long],
      other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    other.foreach(offer(heap, _))
    heap
  }

  override def eval(heap: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(heap.toArray.sorted(Ordering[Long].reverse))

  override def serialize(heap: mutable.PriorityQueue[Long]): Array[Byte] = {
    val buf = ByteBuffer.allocate(4 + 8 * heap.size)
    buf.putInt(heap.size)
    heap.foreach(buf.putLong)
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) { heap.enqueue(buf.getLong); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKAgg =
    copy(child = newChild)
}
