package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** Approximate heavy hitters — ClickHouse's `topK(k)` aggregate
  * (space-saving, Metwally et al. 2005) as a mergeable typed aggregate.
  *
  * The buffer tracks at most `capacity` counters. A tracked value
  * increments; an untracked value evicts the minimum counter and inherits
  * its count as error (the classic guarantee: any value with true frequency
  * > n/capacity is present, and counts overestimate by at most the evicted
  * minimum). Partial buffers merge with the conservative union rule — an
  * item absent from one side contributes that side's minimum count as both
  * count and error — so the guarantee survives map-side partials.
  *
  * With `capacity` ≥ the group's distinct count nothing ever evicts and the
  * result is EXACT (counts are plain sums), which is what makes the oracle
  * row checkable at the test SFs while the same code path caps memory at
  * O(capacity) per group at 100 TB.
  *
  * Result: the top `k` values ordered by (count desc, value asc) —
  * deterministic under ties, binary string order on both engines.
  */
final case class TopKAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    /** When set, each row contributes this weight instead of 1 — the
      * ClickHouse `topKWeighted` surface. Must evaluate to a long.
      */
    weight: Option[Expression] = None,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.State] with ImplicitCastInputTypes {

  require(k >= 1 && capacity >= k, "need capacity ≥ k ≥ 1")

  override def children: Seq[Expression] = child +: weight.toSeq
  // analysis-time contract: child auto-casts to string, weight to long —
  // never a runtime ClassCastException in update()
  override def inputTypes: Seq[DataType] =
    StringType +: weight.map(_ => LongType: DataType).toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): TopKAgg.State = new TopKAgg.State()

  override def update(buf: TopKAgg.State, input: InternalRow): TopKAgg.State = {
    val v = child.eval(input)
    if (v != null) {
      val w = weight match {
        case None => 1L
        case Some(we) =>
          val wv = we.eval(input)
          if (wv == null) 0L else wv.asInstanceOf[Number].longValue()
      }
      if (w > 0) buf.offer(v.asInstanceOf[UTF8String], w, 0L, capacity)
    }
    buf
  }

  override def merge(b1: TopKAgg.State, b2: TopKAgg.State): TopKAgg.State =
    TopKAgg.union(b1, b2, capacity)

  override def eval(buf: TopKAgg.State): Any = TopKAgg.evalTopK(buf, k)

  override def serialize(buf: TopKAgg.State): Array[Byte] = TopKAgg.write(buf)

  override def deserialize(bytes: Array[Byte]): TopKAgg.State = TopKAgg.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head, weight = newChildren.lift(1))
  override def prettyName: String =
    if (weight.isDefined) "topk_weighted" else "topk_approx"
}

object TopKAgg {

  /** Conservative union (preserves the overestimate-only invariant): an
    * item one side never tracked could have had up to that side's minimum
    * count before eviction — credit it and flag it as error. Shared by
    * in-query partial merges AND the `-Merge` combinator re-aggregating
    * persisted `-State` cells.
    */
  def union(b1: State, b2: State, capacity: Int): State = {
    val m1 = b1.minIfFull(capacity)
    val m2 = b2.minIfFull(capacity)
    val it = b2.items.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val inB1 = b1.items.get(e.getKey)
      if (inB1 != null) { inB1(0) += e.getValue()(0); inB1(1) += e.getValue()(1) }
      else b1.offer(e.getKey, e.getValue()(0) + m1, e.getValue()(1) + m1, capacity)
    }
    if (m2 > 0) {
      val it1 = b1.items.entrySet().iterator()
      while (it1.hasNext) {
        val e = it1.next()
        if (!b2.items.containsKey(e.getKey)) {
          e.getValue()(0) += m2; e.getValue()(1) += m2
        }
      }
    }
    b1
  }

  /** Top `k` by (count desc, value asc) — deterministic under ties. */
  def evalTopK(buf: State, k: Int): GenericArrayData = {
    val arr = new Array[(UTF8String, Long)](buf.items.size())
    val it = buf.items.entrySet().iterator()
    var i = 0
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue()(0)); i += 1 }
    val top = arr.sortWith { case ((va, ca), (vb, cb)) =>
      if (ca != cb) ca > cb else va.compareTo(vb) < 0
    }.take(k).map(_._1.asInstanceOf[AnyRef])
    new GenericArrayData(top)
  }

  /** State wire format: count, then (len, bytes, count, error) per item —
    * the SAME encoding for shuffle partials and persisted `-State` cells,
    * so a stored state column re-aggregates bit-compatibly.
    */
  def write(buf: State): Array[Byte] = {
    var size = 4
    val it0 = buf.items.keySet().iterator()
    while (it0.hasNext) size += 4 + it0.next().numBytes() + 16
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.items.size())
    val it = buf.items.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bytes = e.getKey.getBytes
      bb.putInt(bytes.length); bb.put(bytes)
      bb.putLong(e.getValue()(0)); bb.putLong(e.getValue()(1))
    }
    bb.array()
  }

  def read(bytes: Array[Byte]): State = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new State()
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      st.items.put(UTF8String.fromBytes(b), Array(bb.getLong, bb.getLong))
      i += 1
    }
    st
  }

  /** Counter table: value → [count, error]. Eviction scans for the minimum
    * (O(capacity), but only on a miss with a full table — the cold path).
    */
  final class State {
    val items = new java.util.HashMap[UTF8String, Array[Long]]()

    def minIfFull(capacity: Int): Long =
      if (items.size() < capacity) 0L else minCount()

    private def minCount(): Long = {
      var m = Long.MaxValue
      val it = items.values().iterator()
      while (it.hasNext) { val c = it.next()(0); if (c < m) m = c }
      if (m == Long.MaxValue) 0L else m
    }

    /** Space-saving insert: increment if tracked, add if room, else evict
      * the minimum and inherit its count as error.
      */
    def offer(value: UTF8String, inc: Long, err: Long, capacity: Int): Unit = {
      val cur = items.get(value)
      if (cur != null) { cur(0) += inc; cur(1) += err }
      else if (items.size() < capacity)
        items.put(value.clone(), Array(inc, err))
      else {
        var minKey: UTF8String = null
        var minC = Long.MaxValue
        val it = items.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue()(0) < minC) { minC = e.getValue()(0); minKey = e.getKey }
        }
        items.remove(minKey)
        items.put(value.clone(), Array(minC + inc, minC + err))
      }
    }
  }
}
