package graft

import graft.functions.MinHashAgg
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized properties of the one-pass MinHash signature aggregate:
  *
  *  1. each signature slot is EXACTLY min over the set of (a_j·h + b_j)
  *     mod p — the definition the DuckDB oracle recomputes;
  *  2. order- and split-invariance: any partition of the rows into partial
  *     buffers (with ser/de at the boundary, as a shuffle would impose)
  *     merges to the whole-stream signature — the property that makes
  *     map-side partials safe;
  *  3. the signature estimates Jaccard: across many random pairs with
  *     planted overlap, the fraction of agreeing slots tracks true
  *     J(A,B) (seeded, so deterministic).
  */
class MinHashAggPropertySpec extends AnyFunSuite {

  private val rng = new Random(42L)
  private val agg = MinHashAgg(BoundReference(0, LongType, nullable = true),
    MinHashAgg.defaultA, MinHashAgg.defaultB, MinHashAgg.Prime)

  private def h32(): Long = rng.nextInt().toLong & 0xFFFFFFFFL

  private def sigOf(xs: Seq[Long]): Seq[Long] = {
    val st = agg.createAggregationBuffer()
    xs.foreach(h => agg.update(st, InternalRow(h)))
    agg.eval(st).asInstanceOf[GenericArrayData].toLongArray().toSeq
  }

  private def bruteSig(xs: Seq[Long]): Seq[Long] =
    MinHashAgg.defaultA.zip(MinHashAgg.defaultB).map { case (a, b) =>
      if (xs.isEmpty) Long.MaxValue
      else xs.map(h => (a * h + b) % MinHashAgg.Prime).min
    }

  test("signature slots equal the brute-force per-permutation minimum (20 trials)") {
    (1 to 20).foreach { trial =>
      val xs = Seq.fill(1 + rng.nextInt(400))(h32())
      assert(sigOf(xs) == bruteSig(xs), s"trial=$trial n=${xs.size}")
    }
  }

  test("random splits with ser/de merge to the whole-stream signature (20 trials)") {
    (1 to 20).foreach { trial =>
      val xs = Seq.fill(50 + rng.nextInt(400))(h32())
      val parts = 2 + rng.nextInt(5)
      val chunks = rng.shuffle(xs).grouped(
        math.max(1, (xs.size + parts - 1) / parts)).toSeq
      val merged = chunks.map { c =>
        val st = agg.createAggregationBuffer()
        c.foreach(h => agg.update(st, InternalRow(h)))
        agg.deserialize(agg.serialize(st))
      }.reduceLeft(agg.merge)
      assert(merged.toSeq == bruteSig(xs), s"trial=$trial parts=${chunks.size}")
    }
  }

  test("slot-agreement fraction tracks true Jaccard (100 planted-overlap pairs)") {
    val errs = (1 to 100).map { _ =>
      val shared = Seq.fill(20 + rng.nextInt(200))(h32()).distinct
      val onlyA = Seq.fill(rng.nextInt(200))(h32()).distinct.diff(shared)
      val onlyB = Seq.fill(rng.nextInt(200))(h32()).distinct.diff(shared)
      val a = shared ++ onlyA
      val b = shared ++ onlyB
      val j = shared.size.toDouble / (shared.size + onlyA.size + onlyB.size)
      val est = sigOf(a).zip(sigOf(b)).count { case (x, y) => x == y }.toDouble /
        MinHashAgg.NumPerms
      math.abs(est - j)
    }
    // 16 perms → sd per pair ≈ 0.12; the MEAN error over 100 pairs must be
    // far tighter (seeded rng, deterministic)
    val mean = errs.sum / errs.size
    assert(mean <= 0.12, f"mean |est - J| = $mean%.3f")
    assert(errs.max <= 0.45, f"worst pair error ${errs.max}%.3f")
  }
}
