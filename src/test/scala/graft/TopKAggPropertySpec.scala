package graft

import graft.functions.TopKAgg
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._
import scala.util.Random

/** Randomized properties of the space-saving aggregate (Metwally et al.
  * 2005) in the eviction regime — capacity far below the distinct count,
  * the regime the oracle (exact at ample capacity) cannot reach:
  *
  *  1. single-stream: counter sum equals n, the minimum counter is ≤
  *     n/capacity, and any value with true frequency > n/capacity is
  *     tracked (no false negatives);
  *  2. estimates bracket truth: true ≤ count and count − error ≤ true;
  *  3. conservative-union merge preserves the bracket AND the untracked
  *     bound (any untracked value's true count ≤ the final minimum
  *     counter) across arbitrary partial splits;
  *  4. serialize/deserialize is lossless mid-aggregation.
  *
  * Pure expression-level (no SparkSession): update/merge/eval are driven
  * exactly as Spark's TypedImperativeAggregate execution would.
  */
class TopKAggPropertySpec extends AnyFunSuite {

  private val rng = new Random(20260812L)

  private def agg(capacity: Int, k: Int = 3): TopKAgg =
    TopKAgg(BoundReference(0, StringType, nullable = true), k, capacity)

  /** Skewed stream: id drawn as floor(u^3 · universe) — few heavy values,
    * a long singleton tail.
    */
  private def stream(n: Int, universe: Int): Seq[String] =
    Seq.fill(n) { val u = rng.nextDouble(); s"v${(u * u * u * universe).toInt}" }

  private def trueCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def counters(st: TopKAgg.State): Map[String, (Long, Long)] =
    st.items.entrySet().asScala
      .map(e => e.getKey.toString -> (e.getValue()(0), e.getValue()(1))).toMap

  private def feed(a: TopKAgg, xs: Seq[String]): TopKAgg.State = {
    val st = a.createAggregationBuffer()
    xs.foreach(v => a.update(st, InternalRow(UTF8String.fromString(v))))
    st
  }

  test("single-stream guarantees at small capacities (25 random trials)") {
    (1 to 25).foreach { trial =>
      val capacity = 4 + rng.nextInt(29)
      val n = 300 + rng.nextInt(2701)
      val xs = stream(n, capacity * 8)
      val truth = trueCounts(xs)
      val a = agg(capacity)
      val got = counters(feed(a, xs))
      val ctx = s"trial=$trial capacity=$capacity n=$n distinct=${truth.size}"

      // counts conserve the stream length exactly (pure space-saving)
      assert(got.values.map(_._1).sum == n, ctx)
      val minC = got.values.map(_._1).min
      assert(minC <= n.toDouble / capacity, s"$ctx min=$minC")
      // no false negatives above n/capacity
      truth.filter(_._2 > n.toDouble / capacity).keys.foreach { hh =>
        assert(got.contains(hh), s"$ctx heavy hitter $hh evicted")
      }
      // bracket: true ≤ count ∧ count − error ≤ true
      got.foreach { case (v, (c, e)) =>
        val t = truth.getOrElse(v, 0L)
        assert(t <= c && c - e <= t, s"$ctx $v: true=$t count=$c err=$e")
      }
      // untracked values never exceed the minimum counter
      truth.filterNot { case (v, _) => got.contains(v) }.foreach { case (v, t) =>
        assert(t <= minC, s"$ctx untracked $v true=$t > min=$minC")
      }
    }
  }

  test("conservative-union merge preserves the guarantees (25 random trials)") {
    (1 to 25).foreach { trial =>
      val capacity = 4 + rng.nextInt(29)
      val n = 300 + rng.nextInt(2701)
      val xs = stream(n, capacity * 8)
      val truth = trueCounts(xs)
      val parts = 2 + rng.nextInt(4)
      val a = agg(capacity)
      // random split into `parts` partial buffers, then left-fold merge —
      // the shape Spark's partial/final aggregation produces
      val chunks = xs.grouped(math.max(1, (xs.size + parts - 1) / parts)).toSeq
      val merged = chunks.map(feed(a, _)).reduceLeft(a.merge)
      val got = counters(merged)
      val ctx = s"trial=$trial capacity=$capacity n=$n parts=${chunks.size}"

      assert(got.size <= capacity, ctx)
      got.foreach { case (v, (c, e)) =>
        val t = truth.getOrElse(v, 0L)
        assert(t <= c && c - e <= t, s"$ctx $v: true=$t count=$c err=$e")
      }
      val minC = got.values.map(_._1).min
      truth.filterNot { case (v, _) => got.contains(v) }.foreach { case (v, t) =>
        assert(t <= minC, s"$ctx untracked $v true=$t > min=$minC")
      }
      // eval ranks by (count desc, value asc) and returns ≤ k values
      val top = a.eval(merged).asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
        .array.map(_.toString).toSeq
      val expected = got.toSeq.sortBy { case (v, (c, _)) => (-c, v) }.take(3).map(_._1)
      assert(top == expected, s"$ctx eval order")
    }
  }

  test("uniq_upto equals min(exact distinct, n+1) under random splits (25 trials)") {
    val a = graft.functions.UniqUpToAgg(
      BoundReference(0, StringType, nullable = true), n = 10)
    (1 to 25).foreach { trial =>
      val xs = stream(50 + rng.nextInt(500), 5 + rng.nextInt(40))
      val truth = xs.distinct.size.toLong
      val parts = 1 + rng.nextInt(5)
      val chunks = xs.grouped(math.max(1, (xs.size + parts - 1) / parts)).toSeq
      val merged = chunks.map { c =>
        val st = a.createAggregationBuffer()
        c.foreach(v => a.update(st, InternalRow(UTF8String.fromString(v))))
        // ser/de between partial and final, as a real exchange would
        a.deserialize(a.serialize(st))
      }.reduceLeft(a.merge)
      assert(a.eval(merged) == math.min(truth, 11L),
        s"trial=$trial distinct=$truth parts=${chunks.size}")
    }
  }

  test("serialize/deserialize round-trips mid-aggregation state losslessly") {
    (1 to 10).foreach { _ =>
      val capacity = 4 + rng.nextInt(13)
      val a = agg(capacity)
      val st = feed(a, stream(500, capacity * 8))
      val back = a.deserialize(a.serialize(st))
      assert(counters(back) == counters(st))
      // the round-tripped buffer keeps aggregating identically
      val more = stream(200, capacity * 8)
      more.foreach { v =>
        a.update(st, InternalRow(UTF8String.fromString(v)))
        a.update(back, InternalRow(UTF8String.fromString(v)))
      }
      assert(counters(back) == counters(st))
    }
  }
}
