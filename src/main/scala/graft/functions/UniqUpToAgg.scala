package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer

/** ClickHouse's `uniqUpTo(N)` aggregate: the EXACT distinct count while it
  * is ≤ N, and the sentinel N+1 ("more than N") once it exceeds N — at
  * which point the tracked set is dropped and the state is a single flag,
  * so memory is O(min(distinct, N)) per group forever after.
  *
  * That bounded state is the whole point at 100 TB: "does this group have
  * more than N distinct users" costs N small strings of state per group,
  * not a full distinct shuffle — and partials merge map-side (set union
  * while both small; sticky overflow otherwise), so the answer is still
  * exact in both regimes: result = min(true_distinct, N+1) always.
  */
final case class UniqUpToAgg(
    child: Expression,
    n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UniqUpToAgg.State] with ImplicitCastInputTypes {

  require(n >= 1, "need N ≥ 1")

  override def children: Seq[Expression] = Seq(child)
  // analysis-time contract: a non-string child is auto-cast (or rejected),
  // never a runtime ClassCastException in update()
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): UniqUpToAgg.State = new UniqUpToAgg.State()

  override def update(buf: UniqUpToAgg.State, input: InternalRow): UniqUpToAgg.State = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
        // membership test on the (possibly unsafe-buffer-backed) input value
        // first; clone only on actual insert — duplicate rows are the common
        // case near the cap and must not allocate
        val u = v.asInstanceOf[UTF8String]
        if (!buf.seen.contains(u)) {
          buf.seen.add(u.clone())
          if (buf.seen.size() > n) buf.overflow()
        }
      }
    }
    buf
  }

  override def merge(b1: UniqUpToAgg.State, b2: UniqUpToAgg.State): UniqUpToAgg.State =
    UniqUpToAgg.union(b1, b2, n)

  override def eval(buf: UniqUpToAgg.State): Any =
    if (buf.overflowed) (n + 1).toLong else buf.seen.size().toLong

  override def serialize(buf: UniqUpToAgg.State): Array[Byte] = UniqUpToAgg.write(buf)

  override def deserialize(bytes: Array[Byte]): UniqUpToAgg.State = UniqUpToAgg.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpToAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpToAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "uniq_upto"
}

object UniqUpToAgg {

  /** Sticky-overflow set union — in-query partial merges AND the `-Merge`
    * combinator re-aggregating persisted `-State` cells use this one rule,
    * so merging stored cells is semantically exact: union of exact sets is
    * the exact distinct set, and any overflowed input forces overflow.
    */
  def union(b1: State, b2: State, n: Int): State = {
    if (b1.overflowed || b2.overflowed) { b1.overflow(); b1 }
    else {
      b1.seen.addAll(b2.seen)
      if (b1.seen.size() > n) b1.overflow()
      b1
    }
  }

  /** State wire format: overflow flag byte, else (count, (len, bytes)*) —
    * shared by shuffle partials and persisted `-State` cells.
    */
  def write(buf: State): Array[Byte] = {
    if (buf.overflowed) Array[Byte](1)
    else {
      var size = 1 + 4
      val it0 = buf.seen.iterator()
      while (it0.hasNext) size += 4 + it0.next().numBytes()
      val bb = ByteBuffer.allocate(size)
      bb.put(0: Byte)
      bb.putInt(buf.seen.size())
      val it = buf.seen.iterator()
      while (it.hasNext) {
        val bytes = it.next().getBytes
        bb.putInt(bytes.length); bb.put(bytes)
      }
      bb.array()
    }
  }

  def read(bytes: Array[Byte]): State = {
    val st = new State()
    val bb = ByteBuffer.wrap(bytes)
    if (bb.get() == (1: Byte)) st.overflow()
    else {
      val cnt = bb.getInt
      var i = 0
      while (i < cnt) {
        val len = bb.getInt
        val b = new Array[Byte](len); bb.get(b)
        st.seen.add(UTF8String.fromBytes(b))
        i += 1
      }
    }
    st
  }

  /** Distinct set until overflow; after overflow the set is freed and only
    * the flag survives (the state CH keeps for uniqUpTo past N).
    */
  final class State {
    var overflowed: Boolean = false
    var seen = new java.util.HashSet[UTF8String]()

    def overflow(): Unit = {
      overflowed = true
      seen = new java.util.HashSet[UTF8String]() // drop tracked values
    }
  }
}
