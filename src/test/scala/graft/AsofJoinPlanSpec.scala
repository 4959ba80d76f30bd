package graft

import graft.ops.AsofJoin
import graft.plans.{AsofJoinExec, AsofJoinPlan, BroadcastAsofJoinExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom Catalyst ASOF JOIN (logical node → strategy → merge exec)
  * must agree exactly with the union+window composition on every input,
  * and its physical plan must be the operator itself (no join nodes).
  */
class AsofJoinPlanSpec extends SparkSpecBase {

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
    case q: QueryStageExec        => q +: collectNodes(q.plan)
    case other => other +: other.children.flatMap(collectNodes)
  }

  test("custom operator matches the union+window composition on real data") {
    val events = graft.sources.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val w = Window.partitionBy("o_custkey", "o_orderdate")
      .orderBy(col("o_orderkey").desc)
    val orders = graft.sources.Tables(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))

    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("asof_o_orderkey"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    for (strict <- Seq(false, true)) {
      val viaWindow = asMap(AsofJoin.join(events, orders, Seq("user_id"),
        col("ts"), col("o_orderdate"), Seq("o_orderkey"), strict = strict))
      val viaOperator = asMap(AsofJoinPlan.asof(events, orders, Seq("user_id"),
        col("ts"), col("o_orderdate"), Seq("o_orderkey"), strict = strict))
      assert(viaOperator.size == viaWindow.size)
      val diffs = viaOperator.collect {
        case (k, v) if viaWindow(k) != v => (k, v, viaWindow(k))
      }
      assert(diffs.isEmpty, s"strict=$strict first diffs: ${diffs.take(3)}")
    }
  }

  test("ties on (key, time) pick the greatest payload, deterministically") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    val ties = Seq((1L, 50L, "a"), (1L, 50L, "z"), (1L, 50L, "m"))
    for (rows <- Seq(ties, ties.reverse); parts <- Seq(1, 7)) {
      val out = AsofJoinPlan.asof(left, rows.toDF("k", "t2", "v").repartition(parts),
        Seq("k"), col("t"), col("t2"), Seq("v"))
        .select("asof_v").collect().map(_.getString(0)).toSeq
      assert(out == Seq("z"))
    }
  }

  test("left rows with no admissible right row get null payload") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 10L)).toDF("k", "t")
    val right = Seq((1L, 50L, "late")).toDF("k", "t2", "v") // after left's time
    val out = AsofJoinPlan.asof(left, right, Seq("k"), col("t"), col("t2"), Seq("v"))
      .orderBy("k").select("asof_v").collect().map(r => Option(r.getString(0))).toSeq
    assert(out == Seq(None, None))
  }

  test("small right side plans as broadcast as-of: zero shuffle, same answer") {
    val events = graft.sources.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    // raw right side (no window prep) so every exchange in the plan would
    // belong to the as-of operator itself; (key, time) ties exist and both
    // variants must resolve them to the greatest payload
    val orders = graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))

    def run(strict: Boolean) = AsofJoinPlan.asof(events, orders, Seq("user_id"),
      col("ts"), col("o_orderdate"), Seq("o_orderkey"), strict = strict)
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("event_id"), col("asof_o_orderkey"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      for (strict <- Seq(false, true)) {
        // planning happens at first action — materialize each variant
        // while ITS threshold is active
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val merge = run(strict)
        val mergeResult = asMap(merge)
        assert(collectNodes(merge.queryExecution.executedPlan)
          .exists(_.isInstanceOf[AsofJoinExec]), "merge variant not chosen")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
        val bcast = run(strict)
        val bcastResult = asMap(bcast)
        assert(collectNodes(bcast.queryExecution.executedPlan)
          .exists(_.isInstanceOf[BroadcastAsofJoinExec]), "broadcast variant not chosen")
        assert(PlanAudit.audit(bcast.queryExecution.executedPlan).shuffles == 0,
          "broadcast as-of must not shuffle the left side")
        assert(bcastResult == mergeResult, s"strict=$strict variants disagree")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("left-only filters push through the as-of node to the parquet scan") {
    val events = graft.sources.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    val joined = AsofJoinPlan.asof(events, orders, Seq("user_id"),
      col("ts"), col("o_orderdate"), Seq("o_orderkey"))
    val filtered = joined.filter(col("event_id") < 100)
    filtered.count()
    // the left-column predicate must reach the events scan as a pushed filter
    val scans = collectNodes(filtered.queryExecution.executedPlan)
      .filter(_.nodeName.toLowerCase.contains("scan")).map(_.toString)
    assert(scans.exists(s =>
      s.contains("event_id") && s.contains("PushedFilters: [") &&
        !s.contains("PushedFilters: []")),
      s"predicate did not reach a scan:\n${scans.mkString("\n---\n").take(800)}")
    // and the rewrite must not change the answer
    val expect = joined.collect().filter(_.getLong(0) < 100).map(_.toSeq).toSet
    assert(filtered.collect().map(_.toSeq).toSet == expect)
  }

  test("physical plan is the merge operator: no join nodes, SMJ-style exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // pin the merge path
    try {
      val events = graft.sources.Tables(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("ts"))
      val orders = graft.sources.Tables(spark, sfDir, "orders")
        .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
      val df = AsofJoinPlan.asof(events, orders, Seq("user_id"),
        col("ts"), col("o_orderdate"), Seq("o_orderkey"))
      df.count()
      val nodes = collectNodes(df.queryExecution.executedPlan)
      assert(nodes.exists(_.isInstanceOf[AsofJoinExec]), "AsofJoinExec missing")
      val audit = PlanAudit.audit(df.queryExecution.executedPlan)
      assert(audit.broadcastJoins == 0 && audit.sortMergeJoins == 0, s"$audit")
      assert(audit.shuffles == 2, s"one exchange per side expected: $audit")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
