package graft

/** Round-8 fifth batch (#178-#180): independent Scala re-derivations of
  * the semantics at sf0.001.
  */
class AnalyticsR8fSpec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getDouble(3)))

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  private def dow(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).getDayOfWeek.getValue % 7

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("dow_seasonality: factors equal mean ratios, count-weighted mean ≈ 1") {
    val got = run("dow_seasonality").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    val byT = events.groupBy(_._3)
    byT.foreach { case (t, es) =>
      val meanT = es.map(e => cents(e._4)).sum.toDouble / es.length
      es.groupBy(e => dow(e._2)).foreach { case (d, ds) =>
        val meanD = ds.map(e => cents(e._4)).sum.toDouble / ds.length
        val (n, f) = got((t, d))
        assert(n == ds.length.toLong)
        assert(math.abs(f - meanD / meanT) < 1e-3, s"($t,$d)")
      }
      // count-weighted mean of factors is exactly 1 by construction
      val wsum = es.groupBy(e => dow(e._2)).map { case (d, ds) =>
        got((t, d))._2 * ds.length
      }.sum / es.length
      assert(math.abs(wsum - 1.0) < 5e-3, s"$t: weighted factor mean $wsum")
    }
  }

  test("user_newness: day decomposition matches first-day derivation") {
    val userDays = events.map(e => (e._1, dayNum(e._2))).distinct
    val firstDay = userDays.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val exp = userDays.groupBy(_._2).map { case (d, uds) =>
      val nNew = uds.count { case (u, _) => firstDay(u) == d }.toLong
      d -> ((uds.size.toLong, nNew, uds.size - nNew,
        r4(nNew.toDouble / uds.size)))
    }
    val got = run("user_newness").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got == exp)
    // day-1 sanity: everyone active on the first day is new
    val d0 = got.keys.min
    assert(got(d0)._1 == got(d0)._2)
  }

  test("hill_tail equals the sort-and-fold Hill estimator on the top 100") {
    val got = run("hill_tail").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    events.groupBy(_._3).foreach { case (t, es) =>
      val xs = es.map(e => cents(e._4)).filter(_ > 0).sorted.reverse
      val k = math.min(100, xs.length)
      val top = xs.take(k)
      val xRef = top.last
      val alpha = k / top.map(x => math.log(x.toDouble / xRef)).sum
      val (gk, gx, ga) = got(t)
      assert(gk == k.toLong && gx == xRef, s"$t: k/x_ref")
      assert(math.abs(ga - alpha) < 1e-3, s"$t: got $ga want $alpha")
    }
  }
}
