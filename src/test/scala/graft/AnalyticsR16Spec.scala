package graft

import org.apache.spark.sql.functions._

/** Re-derivation pins for the r16 operators (#319-#328) beyond the driver
  * oracle: whitened-covariance tolerance, combinator brute-force twins,
  * the deltaSum merge law, semdedup-default refinement, and the bitmap
  * range walk across the signed/unsigned boundary.
  */
class AnalyticsR16Spec extends SparkSpecBase {

  test("embed_whiten: read-out is identity to ~1e-5 BEFORE rounding") {
    // the oracle pins round(·,4); this pins the real deviation with a
    // 10x margin so a drift toward the rounding edge fails HERE first
    val m = graft.ann.Whitening.modelOf(spark, sfDir)
    val wc = graft.ann.Whitening.sandwich(m.w, m.cov)
    var worst = 0.0
    for (i <- wc.indices; j <- wc.indices) {
      val want = if (i == j) 1.0 else 0.0
      worst = math.max(worst, math.abs(wc(i)(j) - want))
    }
    assert(worst < 1e-5, s"driver-side W^T C W off identity by $worst")
    // and the DISTRIBUTED read-out (matvec + moment pass) agrees
    val rows = run("embed_whiten").collect()
    assert(rows.length == wc.length * (wc.length + 1) / 2)
    rows.foreach { r =>
      val want = if (r.getLong(0) == r.getLong(1)) 1.0 else 0.0
      assert(r.getDouble(3) == want,
        s"cell (${r.getLong(0)},${r.getLong(1)}) = ${r.getDouble(3)}")
    }
  }

  test("group_array_intersect: matches a brute-force per-user set fold") {
    val per = graft.sources.Tables(spark, sfDir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_type"))
      .distinct().collect()
      .groupBy(_.getLong(0))
    val want = per.map { case (u, rows) =>
      val byDay = rows.groupBy(_.getDate(1)).values.map(_.map(_.getString(2)).toSet)
      u -> byDay.reduce(_ intersect _)
    }
    val got = run("group_array_intersect").collect()
      .map(r => r.getLong(0) -> r.getString(2).split(",").filter(_.nonEmpty).toSet)
      .toMap
    assert(got == want, s"diff: ${(got.toSet diff want.toSet).take(3)}")
  }

  test("sum_map_filtered ≡ sum_map restricted to the whitelist keys") {
    val keep = Set("click", "purchase", "view")
    def parse(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      val ks = r.getString(1).split(",").filter(_.nonEmpty)
      val vs = r.getString(2).split(",").filter(_.nonEmpty)
      r.getLong(0) -> ks.zip(vs).toMap
    }.toMap
    val full = parse(run("sum_map").collect())
      .map { case (u, m) => u -> m.filter { case (k, _) => keep(k) } }
      .filter(_._2.nonEmpty)
    val filtered = parse(run("sum_map_filtered").collect()).filter(_._2.nonEmpty)
    assert(filtered == full)
  }

  test("delta_sum_timestamp merge law: cells-in-day-order ≡ one-pass delta_sum") {
    val one = run("delta_sum").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val merged = run("delta_sum_timestamp").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(merged == one)
    assert(one.values.exists(_ > 0.0), "fixture produced no positive deltas")
  }

  test("semdedup_default: cell path is a strict refinement of the label path") {
    // within-(label, cell) pairs ⊆ within-label pairs ⇒ the default path
    // can only KEEP MORE vectors per label than the exact path
    val exact = run("semdedup").collect()
      .map(r => r.get(0) -> r.getLong(2)).toMap // label -> n_kept
    val dflt = run("semdedup_default").collect()
      .map(r => r.get(0) -> r.getLong(2)).toMap
    assert(exact.keySet == dflt.keySet)
    exact.foreach { case (l, k) =>
      assert(dflt(l) >= k, s"label $l: default kept ${dflt(l)} < exact $k")
    }
  }

  test("bitmap_range_card: exact on mixed-sign ranges across the flip boundary") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val vals = Seq(Long.MinValue, -70000L, -66000L, -2L, -1L, 0L, 1L,
      4095L, 4096L, 65535L, 65536L, 70000L, Long.MaxValue)
    val bm = vals.toDF("v").agg(call_function("bitmap_agg", col("v")))
      .collect()(0).getAs[Array[Byte]](0)
    val ranges = Seq(
      (Long.MinValue, Long.MaxValue), (-70000L, 70000L), (-1L, 1L),
      (0L, 65536L), (-66001L, -1L), (1L, 1L), (5L, 4L),
      (Long.MinValue + 1, 0L), (65536L, Long.MaxValue))
    ranges.foreach { case (lo, hi) =>
      val got = spark.range(1).select(
        call_function("bitmap_range_card", lit(bm), lit(lo), lit(hi)))
        .collect()(0).getLong(0)
      val want = vals.count(v => v >= lo && v < hi).toLong
      assert(got == want, s"range [$lo, $hi): $got != $want")
    }
  }
}
