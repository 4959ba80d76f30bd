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
}
