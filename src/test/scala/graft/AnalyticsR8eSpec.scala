package graft

/** Round-8 fourth batch (#174-#176): independent Scala re-derivations of
  * the semantics at sf0.001.
  */
class AnalyticsR8eSpec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("ts", "event_type", "value").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def hourOf(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).getHour.toLong

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("log2_histogram: buckets are bit lengths, shares sum to 1") {
    val pos = events.map(e => (e._2, cents(e._3))).filter(_._2 > 0)
    val exp = pos.groupBy { case (t, c) =>
      (t, java.lang.Long.toBinaryString(c).length.toLong)
    }.map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_._2).sum)) }
    val got = run("log2_histogram").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap == exp)
    // bucket invariant: every value in bucket b lies in [2^(b-1), 2^b)
    got.keys.foreach { case (_, b) => assert(b >= 1 && b < 40) }
    got.keys.map(_._1).toSeq.distinct.foreach { t =>
      val s = got.collect { case ((`t`, _), (_, _, share)) => share }.sum
      assert(math.abs(s - 1.0) < 5e-4, s"$t: Σshare = $s")
    }
  }

  test("value_cdf_probes equals the direct count, monotone in probe") {
    val byType = events.groupBy(_._2).view.mapValues(_.map(e => cents(e._3))).toMap
    val got = run("value_cdf_probes").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    byType.foreach { case (t, cs) =>
      var prev = -1L
      for (p <- Seq(1000L, 2500L, 5000L, 7500L, 9000L)) {
        val nLe = cs.count(_ <= p).toLong
        assert(got((t, p)) == ((nLe, r4(nLe.toDouble / cs.length))), s"($t,$p)")
        assert(nLe >= prev, "CDF must be monotone"); prev = nLe
      }
    }
  }

  test("hour_profile: counts match, exactly one peak per type at the argmax") {
    val exp = events.groupBy(e => (e._2, hourOf(e._1)))
      .view.mapValues(_.size.toLong).toMap
    val got = run("hour_profile").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    assert(got.view.mapValues(_._1).toMap == exp)
    got.keys.map(_._1).toSeq.distinct.foreach { t =>
      val rows = got.collect { case ((`t`, h), (n, _, pk)) => (h, n, pk) }
      assert(rows.count(_._3 == 1L) == 1, s"$t: exactly one peak")
      val (ph, pn, _) = rows.filter(_._3 == 1L).head
      val maxN = rows.map(_._2).max
      assert(pn == maxN, s"$t: peak has max count")
      // tie-break: peak is the EARLIEST hour among max-count cells
      assert(ph == rows.filter(_._2 == maxN).map(_._1).min, s"$t: tie-break")
    }
  }
}
