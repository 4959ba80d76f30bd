package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpecBase {

  test("generic asof join (≤) matches the naive quadratic reference") {
    val events = graft.sources.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    // one right row per (custkey, date): keep the max orderkey
    val w = Window.partitionBy("o_custkey", "o_orderdate")
      .orderBy(col("o_orderkey").desc)
    val orders = graft.sources.Tables(spark, sfDir, "orders")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))

    val got = AsofJoin.join(
      left = events, right = orders, keys = Seq("user_id"),
      leftTime = col("ts"), rightTime = col("o_orderdate"),
      rightPayload = Seq("o_orderkey"))
      .select(col("event_id"), col("asof_o_orderkey"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    // naive reference: per event, max (o_orderdate, o_orderkey) with date ≤ ts
    val naive = events.join(orders, Seq("user_id"), "left")
      .filter(col("o_orderdate").isNull || col("o_orderdate") <= col("ts"))
      .groupBy("event_id")
      .agg(max_by(col("o_orderkey"), struct(col("o_orderdate"), col("o_orderkey")))
        .as("expect"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(got.size == events.count())
    val diffs = got.collect { case (k, v) if naive.getOrElse(k, None) != v => (k, v, naive.get(k)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3)}")
  }

  test("strict (<) excludes same-instant right rows") {
    import spark.implicits._
    val left = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val right = Seq((1L, 100L, "at100"), (1L, 150L, "at150")).toDF("k", "t2", "v")
    def runWith(strict: Boolean) = AsofJoin.join(left, right, Seq("k"),
        col("t"), col("t2"), Seq("v"), strict = strict)
      .orderBy("t").select("asof_v").collect().map(r => Option(r.getString(0))).toSeq
    assert(runWith(false) == Seq(Some("at100"), Some("at150")))
    assert(runWith(true) == Seq(None, Some("at150")))
  }

  test("tied (key, time) right rows resolve deterministically to the greatest payload") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    def runWith(rightRows: Seq[(Long, Long, String)], parts: Int) =
      AsofJoin.join(left, rightRows.toDF("k", "t2", "v").repartition(parts),
        Seq("k"), col("t"), col("t2"), Seq("v"))
        .select("asof_v").collect().map(_.getString(0)).toSeq
    val ties = Seq((1L, 50L, "a"), (1L, 50L, "z"), (1L, 50L, "m"))
    // same winner under any input order or partitioning
    for (rows <- Seq(ties, ties.reverse); parts <- Seq(1, 7))
      assert(runWith(rows, parts) == Seq("z"))
  }

  test("asof plan is single-shuffle (no join nodes)") {
    val events = graft.sources.Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("ts"))
    val orders = graft.sources.Tables(spark, sfDir, "orders")
      .select(col("o_custkey").as("user_id"), col("o_orderdate"), col("o_orderkey"))
    val df = AsofJoin.join(events, orders, Seq("user_id"),
      col("ts"), col("o_orderdate"), Seq("o_orderkey"))
    df.count()
    val a = PlanAudit.audit(df.queryExecution.executedPlan)
    assert(a.broadcastJoins == 0 && a.sortMergeJoins == 0, s"$a")
    assert(a.shuffles == 1, s"$a")
  }
}
