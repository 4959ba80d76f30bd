package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The ClickHouse `topKState` / `topKMerge` combinator pair over
  * [[TopKAgg]]'s space-saving state: `topk_state(value, capacity)` emits
  * the SERIALIZED counter table as a binary cell (store it at fine grain —
  * e.g. per day), and `topk_merge(state, k, capacity)` re-aggregates stored
  * cells at any coarser grain without rescanning the source — the same
  * store-partials-merge-later pattern the bank already exercises for HLL
  * (`uniq_hll`, Relational.scala) with Spark's native sketch pair.
  *
  * Both use [[TopKAgg]]'s exact wire format and conservative-union merge,
  * so `merge(state-cells)` is BIT-IDENTICAL to aggregating the raw rows in
  * one pass — in the exact regime (capacity ≥ distinct) the oracle can
  * therefore pin the re-aggregation against a plain one-level SQL top-k.
  */
final case class TopKStateAgg(
    child: Expression,
    capacity: Int,
    weight: Option[Expression] = None,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.State] with ImplicitCastInputTypes {

  require(capacity >= 1, "need capacity ≥ 1")

  override def children: Seq[Expression] = child +: weight.toSeq
  override def inputTypes: Seq[DataType] =
    StringType +: weight.map(_ => LongType: DataType).toSeq
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

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

  // the -State finisher IS the serialized buffer
  override def eval(buf: TopKAgg.State): Any = TopKAgg.write(buf)

  override def serialize(buf: TopKAgg.State): Array[Byte] = TopKAgg.write(buf)
  override def deserialize(bytes: Array[Byte]): TopKAgg.State = TopKAgg.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKStateAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKStateAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head, weight = newChildren.lift(1))
  override def prettyName: String = "topk_state"
}

/** `topk_merge(state, k, capacity)` — union stored [[TopKStateAgg]] cells
  * and finish to the top-k value list ([[TopKAgg]]'s exact output shape).
  */
final case class TopKMergeAgg(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.State] with ImplicitCastInputTypes {

  require(k >= 1 && capacity >= k, "need capacity ≥ k ≥ 1")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): TopKAgg.State = new TopKAgg.State()

  override def update(buf: TopKAgg.State, input: InternalRow): TopKAgg.State = {
    val v = child.eval(input)
    if (v == null) buf
    else TopKAgg.union(buf, TopKAgg.read(v.asInstanceOf[Array[Byte]]), capacity)
  }

  override def merge(b1: TopKAgg.State, b2: TopKAgg.State): TopKAgg.State =
    TopKAgg.union(b1, b2, capacity)

  override def eval(buf: TopKAgg.State): Any = TopKAgg.evalTopK(buf, k)

  override def serialize(buf: TopKAgg.State): Array[Byte] = TopKAgg.write(buf)
  override def deserialize(bytes: Array[Byte]): TopKAgg.State = TopKAgg.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "topk_merge"
}
