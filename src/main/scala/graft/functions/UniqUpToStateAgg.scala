package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The `uniqUpToState` / `uniqUpToMerge` combinator pair over
  * [[UniqUpToAgg]]'s capped-distinct state — the second half of the CH
  * -State/-Merge surface alongside [[TopKStateAgg]]: store
  * `uniq_upto_state(value, n)` binary cells at fine grain, re-aggregate
  * with `uniq_upto_merge(state, n)` at any coarser grain without
  * rescanning. Unlike a sketch, this re-aggregation is EXACT: union of
  * exact sets is the exact distinct set, and the sticky overflow flag
  * preserves the "more than N" answer — so result = min(true_distinct,
  * N+1) at every grain, pinned by the same oracle as the one-pass form.
  */
final case class UniqUpToStateAgg(
    child: Expression,
    n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UniqUpToAgg.State] with ImplicitCastInputTypes {

  require(n >= 1, "need N ≥ 1")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): UniqUpToAgg.State = new UniqUpToAgg.State()

  override def update(buf: UniqUpToAgg.State, input: InternalRow): UniqUpToAgg.State = {
    if (!buf.overflowed) {
      val v = child.eval(input)
      if (v != null) {
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

  // the -State finisher IS the serialized buffer
  override def eval(buf: UniqUpToAgg.State): Any = UniqUpToAgg.write(buf)

  override def serialize(buf: UniqUpToAgg.State): Array[Byte] = UniqUpToAgg.write(buf)
  override def deserialize(bytes: Array[Byte]): UniqUpToAgg.State = UniqUpToAgg.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpToStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpToStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "uniq_upto_state"
}

/** `uniq_upto_merge(state, n)` — union stored cells, finish to
  * min(distinct, N+1).
  */
final case class UniqUpToMergeAgg(
    child: Expression,
    n: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UniqUpToAgg.State] with ImplicitCastInputTypes {

  require(n >= 1, "need N ≥ 1")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): UniqUpToAgg.State = new UniqUpToAgg.State()

  override def update(buf: UniqUpToAgg.State, input: InternalRow): UniqUpToAgg.State = {
    val v = child.eval(input)
    if (v == null) buf
    else UniqUpToAgg.union(buf, UniqUpToAgg.read(v.asInstanceOf[Array[Byte]]), n)
  }

  override def merge(b1: UniqUpToAgg.State, b2: UniqUpToAgg.State): UniqUpToAgg.State =
    UniqUpToAgg.union(b1, b2, n)

  override def eval(buf: UniqUpToAgg.State): Any =
    if (buf.overflowed) (n + 1).toLong else buf.seen.size().toLong

  override def serialize(buf: UniqUpToAgg.State): Array[Byte] = UniqUpToAgg.write(buf)
  override def deserialize(bytes: Array[Byte]): UniqUpToAgg.State = UniqUpToAgg.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): UniqUpToMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): UniqUpToMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "uniq_upto_merge"
}
