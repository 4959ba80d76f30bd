package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Roaring-style compressed bitset over the FULL long domain — the EXACT
  * twin of the KMV theta-sketch family (CH `groupBitmap` /
  * `groupBitmapAnd/Or/Xor`; reference surface: the bitmap aggregate
  * functions a synced store exposes; design: Chambi et al., "Better
  * bitmap performance with Roaring bitmaps", 2016).
  *
  * Values map through a sign-bit flip (u = v XOR Long.MinValue — the
  * standard signed→unsigned order embedding) so negative ids land in
  * ordinary containers instead of aborting the query (ADVICE r15: the
  * theta-sketch twin accepts the full domain; this must too). The mapped
  * value splits into a 48-bit container key (u >>> 16) and a 16-bit low
  * part. Each container is one of two forms, chosen by cardinality:
  *
  *  - ARRAY (≤ 4096 members): sorted chars — 2 bytes/member, the sparse
  *    form;
  *  - BITMAP (> 4096): 1024 longs (8 KB) — the dense form, at most 2
  *    bytes/member by construction.
  *
  * The form is CANONICAL given the member set (never downgraded, and
  * growth is monotone under insert-only updates), so any update/merge
  * order serializes to identical bytes — partials, shuffles, and
  * persisted `-State` cells re-aggregate bit-compatibly (spec-pinned,
  * the KmvAgg discipline). State is ≤ 2 bytes per distinct member plus
  * ~21 bytes per touched 65536-value range — 150k distinct users cost
  * ~300 KB, and a 100 TB-scale 1B-user bitmap ~2 GB SPREAD ACROSS the
  * per-group cells of the aggregation, never one buffer (the per-type
  * cell over a 1B dense domain is ~128 MB-bounded by the dense form).
  *
  * Set algebra (and/or/xor cardinalities) runs on the ≤C(|groups|,2)
  * serialized cells with container-wise joint walks — one and-count per
  * container pair; or/xor derive from |A|+|B| by inclusion-exclusion.
  */
object GraftBitmap {

  val ArrayCap = 4096

  final class Container {
    var n: Int = 0
    var arr: Array[Char] = new Array[Char](4)
    var bits: Array[Long] = _

    def card: Int = n

    def add(low: Int): Unit = {
      if (bits != null) {
        val w = low >>> 6
        val m = 1L << (low & 63)
        if ((bits(w) & m) == 0L) { bits(w) |= m; n += 1 }
      } else {
        val idx = java.util.Arrays.binarySearch(arr, 0, n, low.toChar)
        if (idx < 0) {
          if (n == ArrayCap) { upgrade(); add(low) }
          else {
            if (n == arr.length)
              arr = java.util.Arrays.copyOf(arr, math.min(arr.length * 2, ArrayCap))
            val at = -idx - 1
            System.arraycopy(arr, at, arr, at + 1, n - at)
            arr(at) = low.toChar
            n += 1
          }
        }
      }
    }

    private def upgrade(): Unit = {
      bits = new Array[Long](1024)
      var i = 0
      while (i < n) {
        val v = arr(i).toInt
        bits(v >>> 6) |= 1L << (v & 63)
        i += 1
      }
      arr = null
    }

    def foreachMember(f: Int => Unit): Unit = {
      if (bits != null) {
        var w = 0
        while (w < 1024) {
          var word = bits(w)
          while (word != 0L) {
            val b = java.lang.Long.numberOfTrailingZeros(word)
            f((w << 6) | b)
            word &= word - 1
          }
          w += 1
        }
      } else {
        var i = 0
        while (i < n) { f(arr(i).toInt); i += 1 }
      }
    }

    def contains(low: Int): Boolean =
      if (bits != null) (bits(low >>> 6) & (1L << (low & 63))) != 0L
      else java.util.Arrays.binarySearch(arr, 0, n, low.toChar) >= 0

    /** |this ∩ other| — the one primitive the pair algebra needs. */
    def andCard(o: Container): Long = {
      if (bits != null && o.bits != null) {
        var s = 0L; var w = 0
        while (w < 1024) { s += java.lang.Long.bitCount(bits(w) & o.bits(w)); w += 1 }
        s
      } else if (bits == null && o.bits == null) {
        var s = 0L; var i = 0; var j = 0
        while (i < n && j < o.n) {
          val a = arr(i); val b = o.arr(j)
          if (a == b) { s += 1; i += 1; j += 1 }
          else if (a < b) i += 1 else j += 1
        }
        s
      } else {
        val (sparse, dense) = if (bits == null) (this, o) else (o, this)
        var s = 0L; var i = 0
        while (i < sparse.n) {
          if (dense.contains(sparse.arr(i).toInt)) s += 1
          i += 1
        }
        s
      }
    }
  }

  final class Bitmap {
    val containers = new java.util.TreeMap[Long, Container]()

    def add(v: Long): Unit = addMapped(v ^ Long.MinValue)

    /** Insert an ALREADY sign-flip-mapped value — the internal entry point
      * for algebra that reconstructs members from (container key, low)
      * pairs, which live in the mapped domain.
      */
    private[functions] def addMapped(u: Long): Unit = {
      var c = containers.get(u >>> 16)
      if (c == null) { c = new Container; containers.put(u >>> 16, c) }
      c.add((u & 0xFFFFL).toInt)
    }

    def cardinality: Long = {
      var s = 0L
      val it = containers.values().iterator()
      while (it.hasNext) s += it.next().card
      s
    }

    def merge(o: Bitmap): Unit = {
      val it = o.containers.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        var c = containers.get(e.getKey)
        if (c == null) { c = new Container; containers.put(e.getKey, c) }
        val mine = c
        e.getValue.foreachMember(mine.add)
      }
    }

    def andCard(o: Bitmap): Long = {
      var s = 0L
      val it = containers.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val oc = o.containers.get(e.getKey)
        if (oc != null) s += e.getValue.andCard(oc)
      }
      s
    }

    /** |members ∩ [lo, hi)| over the UNMAPPED (signed) value domain. The
      * sign-flip embedding preserves signed order under UNSIGNED
      * comparison, so the walk is one TreeMap.subMap over the container
      * keys spanned by the mapped bounds: interior containers contribute
      * their cardinality, the ≤2 boundary containers filter members with
      * compareUnsigned. O(containers in range) — never a full scan.
      */
    def rangeCard(lo: Long, hi: Long): Long = {
      if (hi <= lo) return 0L
      val mlo = lo ^ Long.MinValue
      val mhi = hi ^ Long.MinValue // exclusive; >u mlo because hi > lo
      val loKey = mlo >>> 16
      val hiKey = (mhi - 1) >>> 16 // key of the last INCLUDED value
      var s = 0L
      val it = containers.subMap(loKey, true, hiKey, true).entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        if (k > loKey && k < hiKey) s += e.getValue.card
        else {
          // boundary container: reconstructed members are MAPPED values
          // (top bit possibly set) — compare unsigned, never signed
          val base = k << 16
          e.getValue.foreachMember { low =>
            val u = base | low.toLong
            if (java.lang.Long.compareUnsigned(u, mlo) >= 0 &&
              java.lang.Long.compareUnsigned(u, mhi) < 0) s += 1
          }
        }
      }
      s
    }

    def serialize: Array[Byte] = {
      var size = 8
      val it0 = containers.values().iterator()
      while (it0.hasNext) {
        val c = it0.next()
        size += 8 + 1 + 4 + (if (c.bits != null) 8192 else 2 * c.n)
      }
      val bb = ByteBuffer.allocate(size)
      bb.putInt(GraftBitmap.FormatVersion)
      bb.putInt(containers.size())
      val it = containers.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        bb.putLong(e.getKey)
        if (c.bits != null) {
          bb.put(1: Byte); bb.putInt(c.n)
          var w = 0
          while (w < 1024) { bb.putLong(c.bits(w)); w += 1 }
        } else {
          bb.put(0: Byte); bb.putInt(c.n)
          var i = 0
          while (i < c.n) { bb.putChar(c.arr(i)); i += 1 }
        }
      }
      bb.array()
    }
  }

  /** Serialization format tag (r17, ADVICE item 3): the r16 sign-flip
    * remap (v XOR Long.MinValue) silently changed what serialized bytes
    * MEAN — bitmaps persisted by pre-r16 code (streaming state-store
    * checkpoints, stored cell tables) would deserialize into the mapped
    * domain and yield wrong members. The header makes any stale or
    * foreign state fail LOUDLY here instead of decoding to different
    * members. High bits are a magic marker so a legacy header (a small
    * container count) can never collide with it.
    */
  val FormatVersion: Int = 0x42A70000 | 2 // "BitmapAgg" magic | format v2

  def deserialize(bytes: Array[Byte]): Bitmap = {
    val bb = ByteBuffer.wrap(bytes)
    val bm = new Bitmap
    val ver = bb.getInt
    require(ver == FormatVersion,
      s"bitmap state format mismatch: got 0x${ver.toHexString}, expected " +
        s"0x${FormatVersion.toHexString} — persisted bitmap state from " +
        "before the r16 sign-flip remap (or a foreign format) must be " +
        "regenerated, not decoded")
    val nc = bb.getInt
    var k = 0
    while (k < nc) {
      val key = bb.getLong
      val tag = bb.get()
      val n = bb.getInt
      val c = new Container
      if (tag == 1) {
        c.bits = new Array[Long](1024); c.arr = null; c.n = n
        var w = 0
        while (w < 1024) { c.bits(w) = bb.getLong; w += 1 }
      } else {
        c.arr = new Array[Char](math.max(4, n)); c.n = n
        var i = 0
        while (i < n) { c.arr(i) = bb.getChar; i += 1 }
      }
      bm.containers.put(key, c)
      k += 1
    }
    bm
  }
}

/** `bitmap_agg(long)` — fold longs (full signed domain) into one
  * serialized compressed bitmap per group (the CH `groupBitmapState`
  * shape). Exact at EVERY scale — the contrast row to `kmv_sketch`'s
  * capacity regime.
  */
final case class BitmapAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftBitmap.Bitmap] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): GraftBitmap.Bitmap = new GraftBitmap.Bitmap

  override def update(buf: GraftBitmap.Bitmap, input: InternalRow): GraftBitmap.Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: GraftBitmap.Bitmap, b2: GraftBitmap.Bitmap): GraftBitmap.Bitmap = {
    b1.merge(b2); b1
  }

  override def eval(buf: GraftBitmap.Bitmap): Any = buf.serialize

  override def serialize(buf: GraftBitmap.Bitmap): Array[Byte] = buf.serialize
  override def deserialize(b: Array[Byte]): GraftBitmap.Bitmap = GraftBitmap.deserialize(b)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bitmap_agg"
}

/** `bitmap_merge(binary)` — the `-Merge` combinator over persisted
  * [[BitmapAgg]] read-outs; union is loss-free and the serialized form is
  * canonical, so merge-of-cells ≡ one-pass BYTE-IDENTICALLY (spec-pinned).
  */
final case class BitmapMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GraftBitmap.Bitmap] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): GraftBitmap.Bitmap = new GraftBitmap.Bitmap

  override def update(buf: GraftBitmap.Bitmap, input: InternalRow): GraftBitmap.Bitmap = {
    val v = child.eval(input)
    if (v != null) buf.merge(GraftBitmap.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(b1: GraftBitmap.Bitmap, b2: GraftBitmap.Bitmap): GraftBitmap.Bitmap = {
    b1.merge(b2); b1
  }

  override def eval(buf: GraftBitmap.Bitmap): Any = buf.serialize

  override def serialize(buf: GraftBitmap.Bitmap): Array[Byte] = buf.serialize
  override def deserialize(b: Array[Byte]): GraftBitmap.Bitmap = GraftBitmap.deserialize(b)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bitmap_merge"
}

/** `bitmap_and_agg(binary)` — N-way INTERSECTION of serialized bitmaps
  * (the CH groupBitmapAnd aggregate): the dual of [[BitmapMergeAgg]].
  * Intersection is associative/commutative, so partials merge exactly;
  * the neutral element is "no cell seen yet" (None), kept distinct from
  * the empty bitmap so a lone cell intersects to itself. The result is
  * re-serialized through the same canonical two-form builder, so any
  * update/merge order yields identical bytes.
  */
final case class BitmapAndAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapAndAgg.State] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BitmapAndAgg.State =
    new BitmapAndAgg.State(None)

  override def update(buf: BitmapAndAgg.State, input: InternalRow): BitmapAndAgg.State = {
    val v = child.eval(input)
    if (v != null) {
      val bm = GraftBitmap.deserialize(v.asInstanceOf[Array[Byte]])
      buf.bm = buf.bm match {
        case None => Some(bm)
        case Some(cur) => Some(BitmapAndAgg.intersect(cur, bm))
      }
    }
    buf
  }

  override def merge(b1: BitmapAndAgg.State, b2: BitmapAndAgg.State): BitmapAndAgg.State = {
    b1.bm = (b1.bm, b2.bm) match {
      case (Some(a), Some(b)) => Some(BitmapAndAgg.intersect(a, b))
      case (a, b) => a.orElse(b)
    }
    b1
  }

  override def eval(buf: BitmapAndAgg.State): Any =
    buf.bm.getOrElse(new GraftBitmap.Bitmap).serialize

  override def serialize(buf: BitmapAndAgg.State): Array[Byte] = {
    val payload = buf.bm.map(_.serialize).getOrElse(Array.empty[Byte])
    val out = new Array[Byte](1 + payload.length)
    out(0) = if (buf.bm.isDefined) 1 else 0
    System.arraycopy(payload, 0, out, 1, payload.length)
    out
  }

  override def deserialize(b: Array[Byte]): BitmapAndAgg.State =
    if (b.length == 0 || b(0) == 0) new BitmapAndAgg.State(None)
    else new BitmapAndAgg.State(Some(GraftBitmap.deserialize(b.drop(1))))

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAndAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAndAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bitmap_and_agg"
}

object BitmapAndAgg {
  final class State(var bm: Option[GraftBitmap.Bitmap])

  /** Container-wise AND, rebuilt through the canonical add path so the
    * result's container forms depend only on the member set.
    */
  def intersect(a: GraftBitmap.Bitmap, b: GraftBitmap.Bitmap): GraftBitmap.Bitmap = {
    val out = new GraftBitmap.Bitmap
    val it = a.containers.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val oc = b.containers.get(e.getKey)
      if (oc != null) {
        // (key, low) pairs live in the sign-flip-mapped domain — rebuild
        // through addMapped, NOT add (which would double-map)
        val hi = e.getKey << 16
        e.getValue.foreachMember { low =>
          if (oc.contains(low)) out.addMapped(hi | low.toLong)
        }
      }
    }
    out
  }
}

/** `bitmap_card(bin)` — cardinality of a serialized bitmap. Eval-only by
  * design: it runs on the ≤|groups| cell grain, never fact rows.
  */
final case class BitmapCard(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any): Any =
    GraftBitmap.deserialize(b.asInstanceOf[Array[Byte]]).cardinality
  override protected def withNewChildInternal(newChild: Expression): BitmapCard =
    copy(child = newChild)
  override def prettyName: String = "bitmap_card"
}

/** `bitmap_range_card(bin, lo, hi)` — |members ∩ [lo, hi)| of a serialized
  * bitmap (the CH bitmapSubsetRange → cardinality read-out): the windowed
  * audience count answered FROM THE CELL, never a fact re-scan. Eval-only
  * on the ≤|groups| cell grain, like [[BitmapCard]]; the walk is bounded
  * by the containers the range spans ([[GraftBitmap.Bitmap.rangeCard]]).
  */
final case class BitmapRangeCard(first: Expression, second: Expression,
    third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(b: Any, lo: Any, hi: Any): Any =
    GraftBitmap.deserialize(b.asInstanceOf[Array[Byte]])
      .rangeCard(lo.asInstanceOf[Long], hi.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BitmapRangeCard =
    copy(newFirst, newSecond, newThird)
  override def prettyName: String = "bitmap_range_card"
}

/** `bitmap_and_card` / `bitmap_or_card` / `bitmap_xor_card` — exact set
  * algebra on two serialized bitmaps (or/xor by inclusion-exclusion from
  * one container-wise and-walk). Pair-grain eval-only, like [[BitmapCard]].
  */
final case class BitmapOpCard(left: Expression, right: Expression, op: String)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(Set("and", "or", "xor")(op), s"bitmap op must be and|or|xor, got $op")
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = GraftBitmap.deserialize(a.asInstanceOf[Array[Byte]])
    val y = GraftBitmap.deserialize(b.asInstanceOf[Array[Byte]])
    val and = x.andCard(y)
    op match {
      case "and" => and
      case "or"  => x.cardinality + y.cardinality - and
      case "xor" => x.cardinality + y.cardinality - 2 * and
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapOpCard =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = s"bitmap_${op}_card"
}
