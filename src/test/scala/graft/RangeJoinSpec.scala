package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._

/** [[graft.ops.RangeJoin]] — the bucketed equi-join rewrite must match the
  * naive inequality join exactly, for every bucket width (width only moves
  * cost, never results), and the planned shape must never be a
  * nested-loop/cartesian product.
  */
class RangeJoinSpec extends SparkSpecBase {

  test("bucketed rewrite equals the naive inequality join across widths") {
    val s = spark
    import s.implicits._
    val points = (0L to 200L by 3).toDF("p")
    // edge shapes: point-width interval, boundary-straddling, empty overlap
    val ivs = Seq((1L, 0L, 10L), (2L, 5L, 5L), (3L, 190L, 210L),
      (4L, 17L, 60L), (5L, 300L, 310L)).toDF("iv_id", "lo", "hi")
    val naive = points.crossJoin(ivs)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (w <- Seq(1L, 4L, 16L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, "p", ivs, "lo", "hi", w)
        .select("p", "iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"width $w diverged")
    }
  }

  test("interval overlap equals the naive inequality join across widths") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 0L, 10L), (2L, 40L, 45L), (3L, 100L, 200L))
      .toDF("lid", "lo_l", "hi_l")
    val r = Seq((7L, 5L, 39L), (8L, 45L, 99L), (9L, 150L, 150L), (10L, 300L, 400L))
      .toDF("rid", "lo_r", "hi_r")
    val naive = l.crossJoin(r)
      .filter(col("lo_l") <= col("hi_r") && col("lo_r") <= col("hi_l"))
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(naive == Set((1L, 7L), (2L, 8L), (3L, 9L)))
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlap(l, "lo_l", "hi_l", r, "lo_r", "hi_r", w)
        .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(got == naive, s"width $w diverged")
    }
  }

  // r5 shape: a pair sharing several buckets is emitted only in the bucket
  // of greatest(loL, loR) — a codegen filter on the joined row — so the
  // plan must contain NO dedup aggregate and no exchange beyond the bucket
  // join itself (the old dropDuplicates added a full-output shuffle +
  // exact-distinct, the dominant exchange at scale for wide intervals).
  test("interval overlap: first-bucket emission — no dedup aggregate, no extra exchange") {
    val s = spark
    import s.implicits._
    val l = Seq((1L, 0L, 100L), (2L, 40L, 145L)).toDF("lid", "lo_l", "hi_l")
    val r = Seq((7L, 5L, 139L), (8L, 45L, 99L)).toDF("rid", "lo_r", "hi_r")
    val df = RangeJoin.intervalOverlap(l, "lo_l", "hi_l", r, "lo_r", "hi_r", 7L)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Aggregate"),
      "first-bucket emission must not need a dedup aggregate:\n" + plan.take(800))
    val a = PlanAudit.audit(df.queryExecution.executedPlan)
    assert(a.shuffles <= 2, s"extra exchange beyond the bucket join: $a")
  }

  test("property: random points/intervals/widths always equal the naive join") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 5) {
      val points = Seq.fill(40)(rnd.nextLong() % 500).zipWithIndex
        .map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
      val ivs = Seq.fill(15) {
        val lo = rnd.nextLong() % 500
        (lo, lo + rnd.nextInt(120))
      }.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("iv_id", "lo", "hi")
      val naive = points.crossJoin(ivs)
        .filter(col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = 1L + rnd.nextInt(200)
      val got = RangeJoin.pointInInterval(points, "p", ivs, "lo", "hi", w)
        .select("pid", "iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == naive, s"width $w")
    }
  }

  test("range_join query plans as an equi-join — no nested loop, no cartesian") {
    val df = run("range_join")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "range join degraded to a nested loop:\n" + plan.take(800))
  }

  test("interval_overlap query plans as an equi-join too") {
    val df = run("interval_overlap")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "overlap join degraded to a nested loop:\n" + plan.take(800))
  }
}
