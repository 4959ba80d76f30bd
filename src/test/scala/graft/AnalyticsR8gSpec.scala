package graft

/** Round-8 sixth batch (#181-#183): independent Scala re-derivations of
  * the semantics at sf0.001.
  */
class AnalyticsR8gSpec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("burstiness equals the population var/mean fold over daily counts") {
    val got = run("burstiness").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    events.groupBy(_._4).foreach { case (t, es) =>
      val daily = es.groupBy(e => dayNum(e._2)).values.map(_.size.toDouble).toSeq
      val k = daily.size
      val mean = daily.sum / k
      val varP = daily.map(x => x * x).sum / k - mean * mean
      val (gk, gm, gf, gcv) = got(t)
      assert(gk == k.toLong)
      assert(math.abs(gm - mean) < 1e-3 && math.abs(gf - varP / mean) < 1e-3)
      assert(math.abs(gcv - math.sqrt(varP) / mean) < 1e-3)
      assert(gf >= 0 && gcv >= 0)
    }
  }

  test("retention_curve: offset-0 is everyone, monotone nothing required but bounded") {
    val userDays = events.map(e => (e._1, dayNum(e._2))).distinct
    val firstDay = userDays.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val total = firstDay.size.toLong
    val exp = userDays.map { case (u, d) => d - firstDay(u) }
      .groupBy(identity).map { case (o, os) =>
        o -> ((os.size.toLong, r4(os.size.toDouble / total)))
      }
    val got = run("retention_curve").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == exp)
    assert(got(0L) == ((total, 1.0)), "offset 0 = the whole population")
    got.foreach { case (_, (n, ratio)) =>
      assert(n <= total && ratio <= 1.0 + 1e-9)
    }
  }

  test("gap_survival equals direct horizon counts, monotone decreasing") {
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
    val gaps = events.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (us(e._2), e._3))
      sorted.drop(1).zip(sorted.dropRight(1)).map { case (cur, prev) =>
        cur._4 -> (us(cur._2) - us(prev._2))
      }
    }.toSeq
    val got = run("gap_survival").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    gaps.groupBy(_._1).foreach { case (t, g) =>
      var prev = Long.MaxValue
      for (h <- Seq(60L, 300L, 1800L, 3600L, 21600L)) {
        val nGt = g.count(_._2 > h * 1000000L).toLong
        assert(got((t, h)) == ((nGt, r4(nGt.toDouble / g.size))), s"($t,$h)")
        assert(nGt <= prev, "survival must decrease in the horizon")
        prev = nGt
      }
    }
  }
}
