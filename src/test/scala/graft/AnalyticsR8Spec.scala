package graft

/** Round-8 additions (#152-#156): each checked against an independent
  * Scala re-derivation of the semantics at sf0.001 (the oracle SQL is
  * the driver gate's job; these pin the meaning).
  */
class AnalyticsR8Spec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type", "value", "props")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))

  private def lineitem =
    graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_shipdate", "l_quantity")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  private def dow(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).getDayOfWeek.getValue % 7

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def kOf(props: String): Long =
    "\"k\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(props).get.group(1).toLong

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  test("cube_agg: all four grouping sets from one pass, exact sums") {
    val li = lineitem
    val year = (ts: java.sql.Timestamp) =>
      java.time.Instant.ofEpochMilli(ts.getTime)
        .atZone(java.time.ZoneOffset.UTC).getYear.toLong
    def agg(rows: Array[(String, java.sql.Timestamp, Double)]) =
      (rows.length.toLong, rows.map(r => cents(r._3)).sum)
    val byBoth = li.groupBy(r => (r._1, year(r._2))).view.mapValues(agg).toMap
    val byFlag = li.groupBy(_._1).view.mapValues(agg).toMap
    val byYear = li.groupBy(r => year(r._2)).view.mapValues(agg).toMap
    val total = agg(li)
    val got = run("cube_agg").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), math.round(r.getDouble(3) * 100), r.getLong(4)))).toMap
    assert(got.size ==
      byBoth.size + byFlag.size + byYear.size + 1, "grouping-set cardinality")
    byBoth.foreach { case ((f, y), (n, sq)) =>
      assert(got((f, y.toString)) == ((n, sq, 0L))) }
    byFlag.foreach { case (f, (n, sq)) =>
      assert(got((f, "ALL")) == ((n, sq, 1L))) }
    byYear.foreach { case (y, (n, sq)) =>
      assert(got(("ALL", y.toString)) == ((n, sq, 2L))) }
    assert(got(("ALL", "ALL")) == ((total._1, total._2, 3L)))
  }

  test("range_window_sum: trailing 7-day per-user sum, peers share a frame") {
    val ev = events
    val exp = ev.map { r =>
      val ed = dayNum(r._2)
      r._3 -> ev.filter(q => q._1 == r._1 && {
        val qd = dayNum(q._2); qd >= ed - 6 && qd <= ed
      }).map(q => cents(q._5)).sum
    }.toMap
    val got = run("range_window_sum").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(got == exp)
    // at least one user has events on distinct days, else the frame is vacuous
    assert(ev.groupBy(_._1).values.exists(_.map(e => dayNum(e._2)).distinct.size > 1))
  }

  test("kendall_tau equals the O(n²) pair definition on the bucketed pairs") {
    val pts = events.map(r => ((kOf(r._6) / 10), dow(r._2)))
    var conc = BigInt(0); var disc = BigInt(0)
    for (i <- pts.indices; j <- (i + 1) until pts.length) {
      val s = (pts(i)._1 compare pts(j)._1) * (pts(i)._2 compare pts(j)._2)
      if (s > 0) conc += 1 else if (s < 0) disc += 1
    }
    val n = BigInt(pts.length)
    val tx = pts.groupBy(_._1).values
      .map(g => BigInt(g.length) * (g.length - 1)).sum
    val ty = pts.groupBy(_._2).values
      .map(g => BigInt(g.length) * (g.length - 1)).sum
    val n0 = n.toDouble * (n.toDouble - 1) / 2
    val expTau = r4((conc.toDouble - disc.toDouble)
      / math.sqrt((n0 - tx.toDouble / 2) * (n0 - ty.toDouble / 2)))
    val row = run("kendall_tau").collect().head
    assert(row.getLong(0) == pts.length.toLong)
    assert(math.abs(row.getDouble(1) - expTau) < 1e-9)
  }

  test("median_ci: rank-selected order statistics bracket the median") {
    val byT = events.groupBy(_._4)
    val got = run("median_ci").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    byT.foreach { case (t, rs) =>
      val sorted = rs.map(r => cents(r._5)).sorted
      val n = sorted.length
      val med = sorted((n - 1) / 2) // min c with 2*cum >= n (1-based ceil(n/2))
      val loR = math.max(1,
        math.floor((n - 1.96 * math.sqrt(n)) / 2).toLong)
      val hiR = math.min(n.toLong,
        math.ceil(1 + (n + 1.96 * math.sqrt(n)) / 2).toLong)
      val (lo, hi) = (sorted(loR.toInt - 1), sorted(hiR.toInt - 1))
      assert(got(t) == ((n.toLong, med, lo, hi)), s"type $t")
      assert(lo <= med && med <= hi)
    }
  }

  test("anomaly_zscore: trailing 7-row frame stats on the day grain") {
    val daily = events.groupBy(r => (r._4, dayNum(r._2))).view
      .mapValues(_.map(r => cents(r._5)).sum).toMap
    val got = run("anomaly_zscore").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    daily.groupBy(_._1._1).foreach { case (t, m) =>
      val days = m.keys.map(_._2).toSeq.sorted
      for (i <- days.indices if i >= 6) {
        val frame = (i - 6 to i).map(j => daily((t, days(j))))
        val s = frame.last
        val mean = frame.sum.toDouble / 7
        val varS = frame.map(x => (x - mean) * (x - mean)).sum / 6
        val expZ = if (varS > 0) Some(r4((s - mean) / math.sqrt(varS))) else None
        val (gs, gz) = got((t, days(i)))
        assert(gs == s, s"day sum $t/${days(i)}")
        (gz, expZ) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) < 1e-9, s"$t/${days(i)}")
          case (a, b) => assert(a == b)
        }
      }
      // rows only exist once the frame is full
      assert(!got.keys.exists { case (tt, d) =>
        tt == t && days.indexOf(d) >= 0 && days.indexOf(d) < 6 })
    }
  }

  test("series_decompose: additive identity and integer-exact re-derivation") {
    def day(ts: java.sql.Timestamp): Long =
      Math.floorDiv(Math.floorDiv(ts.getTime, 1000L), 86400L)
    val daily = events.groupBy(e => (e._4, day(e._2))).view
      .mapValues(_.length.toLong).toMap
    val got = run("series_decompose").collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          if (r.isNullAt(5)) None else Some(r.getDouble(5))))
    }.toMap
    assert(got.keySet == daily.keySet)
    daily.foreach { case (k, n) => assert(got(k)._1 == n, s"count $k") }
    got.groupBy(_._1._1).foreach { case (t, rows) =>
      val days = rows.keys.map(_._2).toSeq.sorted
      // re-derive: s7 over the observed day series, dt7 = 7n - s7
      val nOf = days.map(d => d -> daily((t, d))).toMap
      val s7 = days.zipWithIndex.collect {
        case (d, i) if i >= 3 && i <= days.length - 4 =>
          d -> days.slice(i - 3, i + 4).map(nOf).sum
      }.toMap
      val dt7 = s7.map { case (d, s) => d -> (7 * nOf(d) - s) }
      // toSeq BEFORE grouping: keys is a Set, and mapping a day-Set through
      // dt7 would collapse equal dt7 VALUES before the sum
      val byDow = dt7.keys.toSeq.groupBy(d => (d + 4) % 7)
      val tsd = dt7.values.sum
      val tk = dt7.size.toLong
      days.foreach { d =>
        val (_, trend, seasonal, residual) = got((t, d))
        assert(trend.isDefined == s7.contains(d), s"trend presence $t/$d")
        trend.foreach(tr => assert(math.abs(tr - s7(d) / 7.0) <= 5e-5))
        val dowDs = byDow.get((d + 4) % 7)
        val expSeas = dowDs.map { ds =>
          val sd = ds.map(dt7).sum
          val k = ds.size.toLong
          sd.toDouble / (7 * k) - tsd.toDouble / (7 * tk)
        }
        (seasonal, expSeas) match {
          case (Some(a), Some(b)) => assert(math.abs(a - b) <= 5e-5, s"$t/$d")
          case (a, b) => assert(a.isEmpty == b.isEmpty, s"$t/$d seasonal")
        }
        // the decomposition must re-add to the observation:
        // n = trend + seasonal + residual (up to the 1e-4 rounding grid)
        (trend, seasonal, residual) match {
          case (Some(tr), Some(se), Some(re)) =>
            assert(math.abs(tr + se + re - nOf(d)) <= 2e-4, s"additivity $t/$d")
          case _ => ()
        }
      }
    }
  }
}
