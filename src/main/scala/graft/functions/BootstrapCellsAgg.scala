package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All B Poisson-bootstrap replicate cells in ONE pass over fact rows.
  *
  * The declarative form of the distributed Poisson bootstrap (Chamandy et
  * al. 2012) explodes every row ×B to draw per-(row, replicate) weights —
  * at sf10 that is a 640M-row generate feeding a hash aggregate, and it
  * was the full-sweep's worst query (807 s). This aggregate keeps the scan
  * at fact grain: the buffer holds the 2B running sums (Σw and Σw·v per
  * replicate, exact integer cents), each input row draws its B weights in
  * a tight loop over the affine mixers ((a_b·h + b_b) mod p mod 10⁶ →
  * inverse-CDF Poisson(1) threshold walk — the same engine-portable draw
  * the DuckDB oracle spells), and partial buffers merge additively exactly
  * like declarative sum() partials.
  *
  * Input: (h, v_cents) — h the 32-bit md5 fold of the row id, v the
  * value in exact integer cents. Output: array<bigint> of length 2B
  * ([0, B) = Σw per replicate, [B, 2B) = Σw·v_cents per replicate).
  */
final case class BootstrapCellsAgg(
    hChild: Expression,
    vChild: Expression,
    coefA: Seq[Long],
    coefB: Seq[Long],
    prime: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(coefA.length == coefB.length, "coefficient arrays must align")

  private val aArr = coefA.toArray
  private val bArr = coefB.toArray
  private val nReps = aArr.length

  override def children: Seq[Expression] = Seq(hChild, vChild)
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * nReps)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = hChild.eval(input)
    val vv = vChild.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      // SQL-sum semantics per cell (r13 ADVICE fix): a NULL value still
      // contributes its weight to Σw (the row was drawn into the
      // replicate) while Σw·v skips it — exactly how the declarative
      // SUM(w)/SUM(w*v) pair treats v IS NULL, so a null-bearing column
      // can never diverge from the oracle.
      val hasV = vv != null
      val v = if (hasV) vv.asInstanceOf[Long] else 0L
      var b = 0
      while (b < nReps) {
        val r = (aArr(b) * h + bArr(b)) % prime % 1000000L
        // inverse-CDF Poisson(1) over 10^6 grid (same table as the oracle)
        val w =
          if (r < 367879L) 0L else if (r < 735759L) 1L
          else if (r < 919699L) 2L else if (r < 981012L) 3L
          else if (r < 996340L) 4L else if (r < 999406L) 5L
          else if (r < 999917L) 6L else 7L
        buf(b) += w
        if (hasV) buf(nReps + b) += w * v
        b += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < b1.length) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BootstrapCellsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BootstrapCellsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hChild = newChildren(0), vChild = newChildren(1))
  override def prettyName: String = "bootstrap_cells"
}

object BootstrapCellsAgg {

  val NumReps = 64

  /** md5-seeded affine mixers over the MinHash Mersenne prime — ONE
    * portable md5 per row folded to 32 bits, then replicate b's draw is
    * `(a_b·h + b_b) mod (2³¹−1) mod 10⁶` (engine-identical, seedless,
    * pairwise-independent across replicates). Shared with the DuckDB
    * oracle spelling in `graft.ops.AnalyticsR12`.
    */
  val defaultA: IndexedSeq[Long] = (0 until NumReps).map(b =>
    MinHashAgg.seed60(s"boot:a:$b") % (MinHashAgg.Prime - 1) + 1)
  val defaultB: IndexedSeq[Long] = (0 until NumReps).map(b =>
    MinHashAgg.seed60(s"boot:b:$b") % MinHashAgg.Prime)
}
