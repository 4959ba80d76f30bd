package graft

import org.apache.spark.sql.functions._

/** The ClickHouse-surface sketch aggregates: space-saving topK
  * (`graft.functions.TopKAgg`) and the mergeable HLL uniq column.
  */
class SketchAggSpec extends SparkSpecBase {

  test("topk_approx with ample capacity equals the exact SQL top-k") {
    // output is the rank-ordered ","-joined list (scalar-hashable form)
    val got = run("topk_approx").collect()
      .map(r => r.getString(0) -> r.getString(1).split(",").toSeq).toMap
    val ev = graft.sources.Tables(spark, sfDir, "events")
    val exact = ev.groupBy(col("event_type"), col("user_id").cast("string").as("u"))
      .agg(count(lit(1)).as("cnt")).collect()
      .groupBy(_.getString(0))
      .map { case (et, rows) =>
        et -> rows.map(r => (r.getString(1), r.getLong(2)))
          .sortBy { case (u, c) => (-c, u) }.take(5).map(_._1).toSeq
      }
    assert(got == exact)
    assert(got.nonEmpty && got.values.forall(_.size == 5))
  }

  test("topk_weighted with ample capacity equals the exact weighted top-k") {
    val got = run("topk_weighted").collect()
      .map(r => r.getString(0) -> r.getString(1).split(",").toSeq).toMap
    val ev = graft.sources.Tables(spark, sfDir, "events")
    val exact = ev.groupBy(col("event_type"), col("user_id").cast("string").as("u"))
      .agg(sum(floor(col("value")).cast("long")).as("w")).collect()
      .groupBy(_.getString(0))
      .map { case (et, rows) =>
        et -> rows.map(r => (r.getString(1), r.getLong(2)))
          .sortBy { case (u, w) => (-w, u) }.take(5).map(_._1).toSeq
      }
    assert(got == exact)
  }

  test("space-saving guarantee under eviction + partial merges") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // 500×heavy + 100×mid + 200 singleton fillers, capacity 16 ≪ 202
    // distinct. Guarantee: any value with count > n/capacity (= 50) is
    // tracked; overestimates are bounded by the evicted minimum, which never
    // exceeds n/capacity — so heavy and mid must rank 1 and 2 even after
    // map-side partial merges (repartition(7) forces them).
    val rows = Seq.fill(500)("heavy") ++ Seq.fill(100)("mid") ++
      (1 to 200).map(i => s"filler_$i")
    val df = scala.util.Random.javaRandomToRandom(new java.util.Random(42))
      .shuffle(rows).toDF("v").repartition(7)
    val top = df.agg(call_function("topk_approx", col("v"), lit(3), lit(16)))
      .collect()(0).getSeq[String](0)
    assert(top.take(2) == Seq("heavy", "mid"), s"got $top")
  }

  test("quantiles_approx: each estimate sits within the rank-error window") {
    val got = run("quantiles_approx").collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(got.nonEmpty)
    val ev = graft.sources.Tables(spark, sfDir, "events")
    got.foreach { case (et, qs) =>
      val vals = ev.filter(col("event_type") === et)
        .select("value").collect().map(_.getDouble(0)).sorted
      val n = vals.length
      Seq(0.5, 0.95, 0.99).zip(qs).foreach { case (p, est) =>
        // accuracy 1000 → rank error ≤ n/1000 (+1 slack for discreteness)
        val eps = n / 1000 + 1
        val lo = vals(math.max(0, (p * (n - 1)).toInt - eps))
        val hi = vals(math.min(n - 1, math.ceil(p * (n - 1)).toInt + eps))
        assert(est >= lo && est <= hi, s"$et p$p: $est outside [$lo, $hi]")
      }
    }
  }

  test("uniq_hll: estimates track exact counts; union merge equals direct sketch") {
    val ev = graft.sources.Tables(spark, sfDir, "events")
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = ev.agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val got = run("uniq_hll").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet + "__all__")
    (exact + ("__all__" -> exactAll)).foreach { case (k, n) =>
      val est = got(k).toDouble
      assert(math.abs(est - n) / n <= 0.05, s"$k: est $est vs exact $n")
    }
    // merge identity: union of per-type sketches == one global sketch
    val direct = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("e"))
      .collect()(0).getLong(0)
    assert(got("__all__") == direct,
      "union-merged estimate must equal the direct global sketch")
  }
}
