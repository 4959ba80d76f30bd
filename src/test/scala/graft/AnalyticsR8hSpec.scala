package graft

/** Round-8 seventh batch (#184-#186): independent Scala re-derivations of
  * the semantics at sf0.001.
  */
class AnalyticsR8hSpec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("markov_entropy equals the conditional-entropy fold; bounded by ln 5") {
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
    val pairs = events.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (us(e._2), e._3))
      sorted.drop(1).zip(sorted.dropRight(1)).map { case (cur, prev) =>
        (prev._4, cur._4)
      }
    }.toSeq
    val got = run("markov_entropy").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    pairs.groupBy(_._1).foreach { case (prevT, ps) =>
      val np = ps.size
      val h = -ps.groupBy(_._2).values.map { g =>
        val p = g.size.toDouble / np; p * math.log(p)
      }.sum
      val (gn, gh) = got(prevT)
      assert(gn == np.toLong)
      assert(math.abs(gh - h) < 1e-3, s"$prevT: got $gh want $h")
      assert(gh >= -1e-9 && gh <= math.log(5) + 1e-9)
    }
  }

  test("active_days_hist partitions the user population") {
    val kByUser = events.groupBy(_._1)
      .view.mapValues(_.map(e => dayNum(e._2)).distinct.size.toLong).toMap
    val exp = kByUser.values.groupBy(identity)
      .map { case (k, us) => k -> us.size.toLong }
    val got = run("active_days_hist").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.view.mapValues(_._1).toMap == exp)
    assert(got.values.map(_._1).sum == kByUser.size.toLong,
      "histogram must partition all users")
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 5e-4)
  }

  test("revenue_concentration equals the sort-and-take derivation, nested cuts") {
    val totals = events.groupBy(_._1)
      .view.mapValues(_.map(e => cents(e._5)).sum).values.toSeq.sorted.reverse
    val nu = totals.size
    val tot = totals.map(BigInt(_)).sum.toDouble
    val got = run("revenue_concentration").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    var prevShare = 0.0
    for (p <- Seq(1L, 5L, 10L)) {
      val k = math.ceil(p * nu / 100.0).toInt
      val share = totals.take(k).map(BigInt(_)).sum.toDouble / tot
      val (gk, gs) = got(p)
      assert(gk == k.toLong, s"$p%: k")
      assert(math.abs(gs - share) < 1e-3, s"$p%: got $gs want $share")
      assert(gs >= prevShare - 1e-9, "shares nest"); prevShare = gs
    }
    // concentration sanity: top 10% carries more than 10% of revenue
    assert(got(10L)._2 > 0.10)
  }
}
