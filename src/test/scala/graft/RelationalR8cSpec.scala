package graft

/** Round-8 coda batch (#200-#201): independent Scala re-derivations of
  * the semantics at sf0.001.
  */
class RelationalR8cSpec extends SparkSpecBase {

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("status_revenue_rollup equals the exact decimal rollup, shares sum to 1") {
    def d2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val rows = graft.sources.Tables(spark, sfDir, "orders")
      .select("o_orderstatus", "o_totalprice").collect()
      .map(r => (r.getString(0), d2(r.getDouble(1))))
    val tot = rows.map(_._2).sum
    val exp = rows.groupBy(_._1).map { case (st, rs) =>
      val s = rs.map(_._2).sum
      st -> ((rs.length.toLong, s.toDouble, r4((s / tot).toDouble)))
    }
    val got = run("status_revenue_rollup").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (st, (n, rev, share)) =>
      val (gn, grev, gshare) = got(st)
      assert(gn == n && math.abs(grev - rev) < 1e-6 && r4(gshare) == share, st)
    }
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 5e-4)
  }

  test("events_per_user_hist: buckets are bit lengths, users partition") {
    val counts = graft.sources.Tables(spark, sfDir, "events")
      .select("user_id").collect().map(_.getLong(0))
      .groupBy(identity).values.map(_.length.toLong).toSeq
    val exp = counts.groupBy(k => java.lang.Long.toBinaryString(k).length.toLong)
      .map { case (b, ks) => b -> ((ks.size.toLong, ks.sum)) }
    val got = run("events_per_user_hist").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap == exp)
    assert(got.values.map(_._1).sum == counts.size.toLong)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 5e-4)
  }
}
