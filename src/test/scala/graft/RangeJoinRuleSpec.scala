package graft

import graft.plans.RangeJoinRewrite
import org.apache.spark.sql.functions._

/** [[graft.plans.RangeJoinRewrite]] — a BETWEEN-style theta-join must plan
  * as a nested loop WITHOUT the rule, rewrite to an equi-join (same rows,
  * same columns) WITH it, and leave non-matching joins untouched.
  */
class RangeJoinRuleSpec extends SparkSpecBase {

  test("between-join auto-rewrites to an equi-join when the width conf is armed") {
    val s = spark
    import s.implicits._
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      val points = (0L to 300L by 7).toDF("p")
      val ivs = Seq((1L, 10L, 40L), (2L, 35L, 36L), (3L, 250L, 400L), (4L, 500L, 600L))
        .toDF("iv", "lo", "hi")
      def q = points.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      // unarmed: Spark has no equi keys → nested loop
      val basePlan = q.queryExecution.executedPlan.toString
      assert(basePlan.contains("BroadcastNestedLoopJoin") ||
        basePlan.contains("CartesianProduct"), basePlan.take(400))
      val naive = q.collect().map(_.toSeq).toSet
      assert(naive.nonEmpty)

      spark.conf.set(RangeJoinRewrite.WidthKey, "16")
      val rewritten = q
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        "rule did not fire:\n" + plan.take(600))
      assert(rewritten.columns.toSeq == Seq("p", "iv", "lo", "hi"))
      assert(rewritten.collect().map(_.toSeq).toSet == naive)

      // a join the pattern must NOT touch (equality condition) still works
      val eq = points.join(ivs, col("p") === col("lo"))
      assert(eq.count() == 1) // lo ∈ {10, 35, 250, 500}; only 35 is a multiple of 7
    } finally {
      spark.conf.unset(RangeJoinRewrite.WidthKey)
      spark.experimental.extraOptimizations = prev
    }
  }

  // r5: `ts BETWEEN lo AND hi` on TIMESTAMP columns — the form real
  // event-interval queries take — buckets on epoch micros; DATE buckets on
  // epoch days. Without the rule both are nested loops.
  test("timestamp and date between-joins rewrite too (epoch-micros / epoch-days buckets)") {
    val s = spark
    import s.implicits._
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ RangeJoinRewrite
    try {
      def tsOf(h: Int, m: Int = 0) =
        java.sql.Timestamp.valueOf(f"2026-03-01 $h%02d:$m%02d:00")
      val points = (0 until 48).map(i => tsOf(i / 2, 30 * (i % 2))).toDF("ts")
      val ivs = Seq(
        (1L, tsOf(2), tsOf(5)), (2L, tsOf(4, 30), tsOf(4, 30)),
        (3L, tsOf(20), tsOf(23, 30))).toDF("iv", "lo", "hi")
      def q = points.join(ivs, col("ts") >= col("lo") && col("ts") <= col("hi"))
      val basePlan = q.queryExecution.executedPlan.toString
      assert(basePlan.contains("BroadcastNestedLoopJoin") ||
        basePlan.contains("CartesianProduct"), basePlan.take(400))
      val naive = q.collect().map(_.toSeq).toSet
      assert(naive.nonEmpty)

      spark.conf.set(RangeJoinRewrite.WidthKey, "3600000000") // 1 h of micros
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        "rule did not fire on timestamps:\n" + plan.take(600))
      assert(q.collect().map(_.toSeq).toSet == naive)

      // DATE domain: epoch-days buckets, width in days
      val days = (1 to 28).map(d => java.sql.Date.valueOf(f"2026-02-$d%02d")).toDF("d")
      val div = Seq(
        (1L, java.sql.Date.valueOf("2026-02-03"), java.sql.Date.valueOf("2026-02-10")),
        (2L, java.sql.Date.valueOf("2026-02-20"), java.sql.Date.valueOf("2026-02-20")))
        .toDF("iv", "dlo", "dhi")
      def dq = days.join(div, col("d") >= col("dlo") && col("d") <= col("dhi"))
      spark.conf.set(RangeJoinRewrite.WidthKey, "4") // 4-day buckets
      val dplan = dq.queryExecution.executedPlan.toString
      assert(!dplan.contains("BroadcastNestedLoopJoin") &&
        !dplan.contains("CartesianProduct"),
        "rule did not fire on dates:\n" + dplan.take(600))
      assert(dq.collect().map(r => (r.getLong(1), r.getDate(0).toString)).toSet.size == 9)
      // (mixed date/timestamp operands are handled upstream: the analyzer
      // inserts the implicit date→timestamp cast, unifying the domain
      // before this rule sees the condition)
    } finally {
      spark.conf.unset(RangeJoinRewrite.WidthKey)
      spark.experimental.extraOptimizations = prev
    }
  }
}
