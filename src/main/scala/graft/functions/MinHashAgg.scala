package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** All-permutations MinHash signature in ONE pass over shingle-hash rows.
  *
  * Replaces k separate `min((a_j·h + b_j) % p)` aggregate columns with a
  * single typed aggregate holding the k running minima in a primitive
  * long-array buffer: each input row updates every permutation in a tight
  * loop (no per-permutation expression evaluation), partial buffers merge
  * map-side exactly like declarative min() partials, and the result is the
  * signature as `array<bigint>`.
  *
  * Geometry matches the LSH oracle (`graft.dedup.Dedup`): affine maps over
  * 32-bit shingle hashes modulo a Mersenne prime — `a·h < 2^63` never
  * overflows, every value stays positive, so signatures are bit-identical
  * to the DuckDB mirror.
  */
final case class MinHashAgg(
    child: Expression,
    coefA: Seq[Long],
    coefB: Seq[Long],
    prime: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ImplicitCastInputTypes {

  require(coefA.length == coefB.length, "coefficient arrays must align")

  private val aArr = coefA.toArray
  private val bArr = coefB.toArray

  override def children: Seq[Expression] = Seq(child)
  // analysis-time contract: integral children auto-cast to long — never a
  // runtime ClassCastException in update()
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(aArr.length)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < buf.length) {
        val m = (aArr(j) * h + bArr(j)) % prime
        if (m < buf(j)) buf(j) = m
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < b1.length) { if (b2(j) < b1(j)) b1(j) = b2(j); j += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {

  /** 2^31 − 1 (Mersenne) — the modulus both engines agree on. */
  val Prime = 2147483647L

  val NumPerms = 16

  /** Deterministic md5-seeded affine coefficients (shared with the DuckDB
    * oracle spelling in `graft.dedup.Dedup`).
    */
  private[graft] def seed60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(d.take(15), 16)
  }
  val defaultA: IndexedSeq[Long] =
    (0 until NumPerms).map(j => seed60(s"a:$j") % (Prime - 1) + 1)
  val defaultB: IndexedSeq[Long] =
    (0 until NumPerms).map(j => seed60(s"b:$j") % Prime)
}
