package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** K-minimum-values (KMV / bottom-k) distinct sketch — the mergeable
  * theta-sketch family behind ClickHouse's `uniqTheta` and its set-algebra
  * combinators (Beyer et al., "On Synopses for Distinct-Value Estimation
  * Under Multiset Operations", SIGMOD 2007; reference surface: the CH
  * uniqTheta/uniqThetaUnion/uniqThetaIntersect functions a synced store
  * exposes).
  *
  * The buffer keeps the `k` SMALLEST distinct values of a uniform 60-bit
  * hash column. That single invariant buys the whole algebra:
  *
  *  - |S| < k  ⇒ the sketch saw EVERY distinct hash — estimates are exact
  *    (the regime the oracle pins at the test SFs, [[graft.CapacityPins]]);
  *  - |S| = k  ⇒ θ = max(S) is the k-th order statistic of a uniform
  *    sample, n̂ = (k−1)·H/θ with relative error ~1/√(k−2);
  *  - sketches MERGE by keeping the k smallest of the union — associative,
  *    commutative, loss-free w.r.t. the invariant, so map-side partials,
  *    shuffle merges, and persisted `-State` cells all re-aggregate
  *    bit-compatibly (the MinHashAgg/TopKAgg discipline);
  *  - set algebra runs on the RETAINED ARRAYS with plain array built-ins
  *    (union/intersect below θ), never on the corpus — see the
  *    `uniq_theta_ops` query (ops/AnalyticsR14.scala).
  *
  * State is O(min(distinct, k)) longs — it grows lazily, so small groups
  * cost nothing and a 100 TB group is capped at k·8 bytes.
  *
  * Result: the retained hashes as an ASCENDING long array (the `-State`
  * read-out; ascending order makes θ = element_at(arr, k) and keeps the
  * array byte-comparable across engines).
  */
final case class KmvAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.State] with ImplicitCastInputTypes {

  require(k >= 2, "need k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvAgg.State = new KmvAgg.State()

  override def update(buf: KmvAgg.State, input: InternalRow): KmvAgg.State = {
    val v = child.eval(input)
    if (v != null) buf.offer(v.asInstanceOf[Long], k)
    buf
  }

  override def merge(b1: KmvAgg.State, b2: KmvAgg.State): KmvAgg.State = {
    val it = b2.set.iterator()
    while (it.hasNext) b1.offer(it.next(), k)
    b1
  }

  override def eval(buf: KmvAgg.State): Any = {
    val arr = new Array[Any](buf.set.size())
    val it = buf.set.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: KmvAgg.State): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.set.size())
    bb.putInt(buf.set.size())
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.State = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KmvAgg.State()
    val n = bb.getInt
    var i = 0
    while (i < n) { st.set.add(bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_sketch"
}

/** The `-Merge` combinator (CH uniqThetaMerge): re-aggregates PERSISTED
  * KmvAgg read-outs (ascending long arrays) into one sketch — how a 100 TB
  * sink maintains live distinct-set cells per flush and rolls them up
  * without rescanning history (the topk_state/topk_merge discipline on the
  * KMV invariant). Because bottom-k union is loss-free w.r.t. the retained
  * set, merge-of-cells ≡ one-pass over the union of their inputs EXACTLY
  * (KmvSketchSpec pins the identity).
  */
final case class KmvMergeAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.State] {

  require(k >= 2, "need k >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvAgg.State = new KmvAgg.State()

  override def update(buf: KmvAgg.State, input: InternalRow): KmvAgg.State = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      val n = arr.numElements()
      // no ascending-order early exit: kmv_merge is a registered SQL
      // function, so the input array is caller data, not necessarily a
      // sorted kmv_sketch read-out — offer() already rejects a
      // not-bottom-k value with one last() compare, so scanning every
      // element is the same O(n) with correct semantics on ANY order
      // (r14 ADVICE: the old exit silently dropped elements of unsorted
      // input).
      while (i < n) {
        buf.offer(arr.getLong(i), k)
        i += 1
      }
    }
    buf
  }

  override def merge(b1: KmvAgg.State, b2: KmvAgg.State): KmvAgg.State = {
    val it = b2.set.iterator()
    while (it.hasNext) b1.offer(it.next(), k)
    b1
  }

  override def eval(buf: KmvAgg.State): Any = {
    val arr = new Array[Any](buf.set.size())
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr)
  }

  override def serialize(buf: KmvAgg.State): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.set.size())
    bb.putInt(buf.set.size())
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.State = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KmvAgg.State()
    val n = bb.getInt
    var i = 0
    while (i < n) { st.set.add(bb.getLong); i += 1 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_merge"
}

object KmvAgg {

  /** Hash domain size: [[graft.ops.parity.md5Long]] yields 60-bit values. */
  val HashSpace: Double = math.pow(2.0, 60)

  /** Bottom-k set. The hot path on a FULL buffer is one `last()` compare —
    * values ≥ the current k-th smallest are rejected without mutation, so
    * steady-state updates on high-cardinality groups are O(1) comparisons
    * and only genuinely-bottom-k values pay the O(log k) insert.
    */
  final class State {
    val set = new java.util.TreeSet[java.lang.Long]()

    def offer(v: Long, k: Int): Unit = {
      if (set.size() < k) { set.add(v); () }
      else if (v < set.last()) {
        if (set.add(v)) { set.remove(set.last()); () }
      }
    }
  }

  /** Driver-side estimator twin of the `uniq_theta_ops` column spelling —
    * used by the error-window spec to pin the SUB-capacity regime the
    * oracle can't reach: n̂ = (k−1)·H/θ once the sketch saturates.
    */
  def estimate(retained: Array[Long], k: Int): Double =
    if (retained.length < k) retained.length.toDouble
    else (k - 1).toDouble * HashSpace / retained(k - 1).toDouble
}
