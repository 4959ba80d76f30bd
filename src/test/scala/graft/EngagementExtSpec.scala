package graft

import java.sql.Timestamp

/** Independent Scala re-derivations for the r9 engagement additions
  * (#237-239) — brute-force folds over collected sf0.001 rows, sharing no
  * code with the operators under test.
  */
class EngagementExtSpec extends SparkSpecBase {

  private def ordersRows: Seq[(Long, Double, java.time.LocalDate)] =
    spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey", "o_totalprice", "CAST(o_orderdate AS DATE)")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getDate(2).toLocalDate))
      .toSeq

  private def eventsRows: Seq[(Long, String, Long, Long)] =
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("user_id", "event_type",
        "unix_micros(CAST(ts AS TIMESTAMP))", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSeq

  /** Exact lower-quartile cutpoints: min v with cum*den >= n*num. */
  private def cut(sorted: Seq[Long], num: Int, den: Int): Long = {
    val n = sorted.size
    val i = ((n.toLong * num + den - 1) / den - 1).toInt.max(0)
    sorted(i)
  }

  test("rfm_segments: codes re-derived by brute force") {
    val os = ordersRows
    val dmax = os.map(_._3).max
    val byCust = os.groupBy(_._1).map { case (ck, rows) =>
      val freq = rows.size.toLong
      val cents = rows.map(r => BigDecimal(r._2).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) * 100).map(_.toLongExact).sum
      val mon = cents / 100
      val rec = java.time.temporal.ChronoUnit.DAYS
        .between(rows.map(_._3).max, dmax)
      (ck, rec, freq, mon)
    }.toSeq
    def cuts(vs: Seq[Long]): (Long, Long, Long) = {
      val sorted = vs.sorted
      (cut(sorted, 1, 4), cut(sorted, 1, 2), cut(sorted, 3, 4))
    }
    val (r1, r2, r3) = cuts(byCust.map(_._2))
    val (f1, f2, f3) = cuts(byCust.map(_._3))
    val (m1, m2, m3) = cuts(byCust.map(_._4))
    def code(v: Long, q: (Long, Long, Long)): Long =
      1L + (if (v > q._1) 1 else 0) + (if (v > q._2) 1 else 0) +
        (if (v > q._3) 1 else 0)
    val expected = byCust
      .groupBy(c => (code(c._2, (r1, r2, r3)), code(c._3, (f1, f2, f3)),
        code(c._4, (m1, m2, m3))))
      .map { case (k, cs) =>
        k -> (cs.size.toLong,
          BigDecimal(cs.map(_._4).sum) / cs.size)
      }
    val got = run("rfm_segments").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    assert(got.keySet == expected.keySet)
    assert(got.values.map(_._1).sum == byCust.size)
    expected.foreach { case (k, (n, avg)) =>
      assert(got(k)._1 == n, s"segment $k count")
      assert(math.abs(got(k)._2 - avg.toDouble) < 1e-3, s"segment $k avg")
    }
  }

  test("conversion_lag_quantiles: lags re-derived by brute force") {
    val ev = eventsRows
    val lags = ev.groupBy(_._1).flatMap { case (_, rows) =>
      val signups = rows.filter(_._2 == "signup").map(_._3)
      if (signups.isEmpty) None
      else {
        val s = signups.min
        val ps = rows.filter(r => r._2 == "purchase" && r._3 > s).map(_._3)
        if (ps.isEmpty) None else Some((ps.min - s) / 1000000L)
      }
    }.toSeq.sorted
    val row = run("conversion_lag_quantiles").collect().head
    assert(row.getLong(0) == lags.size)
    assert(row.getLong(1) == cut(lags, 1, 4))
    assert(row.getLong(2) == cut(lags, 1, 2))
    assert(row.getLong(3) == cut(lags, 3, 4))
  }

  test("dwell_time_by_type: dwells re-derived by brute force") {
    val ev = eventsRows
    val dwells = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val srt = rows.sortBy(r => (r._3, r._4))
      srt.zip(srt.drop(1)).map { case (a, b) => (a._2, b._3 - a._3) }
    }.filter(_._2 <= 1800L * 1000000L)
    val expected = dwells.groupBy(_._1).map { case (t, ds) =>
      t -> (ds.size.toLong, ds.map(_._2).sum)
    }
    val got = run("dwell_time_by_type").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, (n, sumUs)) =>
      assert(got(t)._1 == n, s"$t count")
      assert(got(t)._2 == sumUs / 1000000L, s"$t total")
      assert(math.abs(got(t)._3 -
        (sumUs.toDouble / n / 1e6)) < 1e-3, s"$t avg")
    }
  }

  test("dau_mau_stickiness: trailing window re-derived by brute force") {
    val dd = eventsRows.map(e => (e._1, e._3 / 86400000000L)).distinct
    val days = dd.map(_._2).distinct.sorted
    val got = run("dau_mau_stickiness").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got.keySet == days.toSet)
    days.foreach { d =>
      val dau = dd.count(_._2 == d).toLong
      val mau = dd.filter(x => x._2 <= d && x._2 > d - 30)
        .map(_._1).distinct.size.toLong
      assert(got(d)._1 == dau, s"day $d dau")
      assert(got(d)._2 == mau, s"day $d mau")
      assert(math.abs(got(d)._3 - dau.toDouble / mau) < 1e-3)
      assert(got(d)._1 <= got(d)._2)
    }
  }

  test("nearest_event_join: nearest click re-derived by brute force") {
    val ev = eventsRows
    val expected = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val clicks = rows.filter(_._2 == "click").map(_._3).sorted
      rows.filter(_._2 == "error").map { e =>
        val gaps = clicks.map(c => math.abs(c - e._3))
        e._4 -> (if (gaps.isEmpty) None else Some(gaps.min / 1000000L))
      }
    }.toMap
    val got = run("nearest_event_join").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got.keySet == expected.keySet)
    // |nearest| is tie-insensitive (prev vs next with equal gap have the
    // same distance), so the brute-force min matches exactly
    assert(got == expected)
  }
}
