package graft

/** #262–#265 ledger/market analytics: each pinned against an independent
  * Scala re-derivation at sf0.001 (the DuckDB oracle is the driver gate's
  * job; these pin the semantics).
  */
class LedgerShapesSpec extends SparkSpecBase {

  private def cents(v: Double): BigDecimal =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  private def kOf(props: String): Long = {
    val m = """"k":\s*(-?\d+)""".r.findFirstMatchIn(props)
    m.get.group(1).toLong
  }

  private def hourOf(ts: java.sql.Timestamp): Long = {
    val sec = Math.floorDiv(ts.getTime, 1000L)
    sec - Math.floorMod(sec, 3600L)
  }

  private lazy val events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))

  test("ohlc_bars: open/close by event_id order, high/low raw, exact volume") {
    val exp = events.groupBy(e => (e._4, hourOf(e._2))).map { case (k, rs) =>
      val byId = rs.sortBy(_._1)
      k -> ((byId.head._5, rs.map(_._5).max, rs.map(_._5).min, byId.last._5,
        rs.map(r => cents(r._5)).sum.toDouble, rs.length.toLong))
    }
    val got = run("ohlc_bars").collect().map(r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6), r.getLong(7)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, v) => assert(got(k) == v, s"bar $k") }
  }

  test("vwap_hourly: integer half-up micro-unit rounding of num/den") {
    val exp = events.groupBy(e => (e._4, hourOf(e._2))).flatMap { case (k, rs) =>
      val den = rs.map(r => kOf(r._6)).sum
      if (den <= 0) None
      else {
        val num = rs.map(r => cents(r._5) * kOf(r._6)).sum
        val numMicro = (num * 1000000).toBigInt
        val v6 = (numMicro * 2 + den) / (2 * den)
        Some(k -> ((v6.toDouble / 1000000d, den, rs.length.toLong)))
      }
    }
    val got = run("vwap_hourly").collect().map(r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, v) => assert(got(k) == v, s"bar $k") }
  }

  test("balance_running: signed replay in event_id order, exact decimals") {
    val exp = events.groupBy(_._3).map { case (u, rs) =>
      var bal = BigDecimal(0)
      var lo = BigDecimal(Double.MaxValue)
      var hi = BigDecimal(Double.MinValue)
      rs.sortBy(_._1).foreach { r =>
        val amt = if (r._4 == "purchase" || r._4 == "signup") cents(r._5)
                  else -cents(r._5)
        bal += amt
        if (bal < lo) lo = bal
        if (bal > hi) hi = bal
      }
      u -> ((rs.length.toLong, bal.toDouble, lo.toDouble, hi.toDouble))
    }
    val got = run("balance_running").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (u, v) => assert(got(u) == v, s"user $u") }
  }

  test("drawdown_max: peak-to-trough of the exact replay, final via last event") {
    val exp = events.groupBy(_._3).map { case (u, rs) =>
      var bal = BigDecimal(0)
      var peak = BigDecimal(Double.MinValue)
      var maxDd = BigDecimal(Double.MinValue)
      var hi = BigDecimal(Double.MinValue)
      rs.sortBy(_._1).foreach { r =>
        val amt = if (r._4 == "purchase" || r._4 == "signup") cents(r._5)
                  else -cents(r._5)
        bal += amt
        if (bal > peak) peak = bal
        if (peak - bal > maxDd) maxDd = peak - bal
        if (bal > hi) hi = bal
      }
      u -> ((rs.length.toLong, maxDd.toDouble, hi.toDouble, bal.toDouble))
    }
    val got = run("drawdown_max").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (u, v) => assert(got(u) == v, s"user $u") }
  }

  test("top_movers: top-20 |Δvolume| with (type, hour) tie-break") {
    val bars = events.groupBy(e => (e._4, hourOf(e._2))).map { case (k, rs) =>
      k -> rs.map(r => cents(r._5)).sum
    }
    val deltas = bars.groupBy(_._1._1).toSeq.flatMap { case (_, cells) =>
      val ordered = cells.toSeq.sortBy(_._1._2)
      ordered.sliding(2).collect {
        case Seq((_, pv), ((t, h), v)) => (t, h, v, pv, v - pv)
      }
    }
    val exp = deltas
      .sortBy { case (t, h, _, _, d) => (-d.abs, t, h) }
      .take(20)
      .map { case (t, h, v, pv, d) =>
        (t, h, v.toDouble, pv.toDouble, d.toDouble) }
      .toSet
    val got = run("top_movers").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toSet
    assert(got == exp)
  }
}
