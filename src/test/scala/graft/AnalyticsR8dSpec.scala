package graft

/** Round-8 third batch (#170-#173): independent Scala re-derivations of
  * the semantics at sf0.001.
  */
class AnalyticsR8dSpec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type", "value", "props")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))

  private def docsRows =
    graft.sources.Tables(spark, sfDir, "documents")
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  private def hourOf(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).getHour.toLong

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def kOf(props: String): Option[Long] =
    "\"k\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(props).map(_.group(1).toLong)

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("cov_corr_matrix equals the naive per-pair moments") {
    val rows = events.flatMap(e =>
      kOf(e._6).map(k => (cents(e._5), k, hourOf(e._2))))
    val feats = Map("v" -> rows.map(_._1), "k" -> rows.map(_._2),
      "h" -> rows.map(_._3))
    val n = rows.length.toDouble
    val got = run("cov_corr_matrix").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_ => r.getDouble(3))))).toMap
    for (pair <- Seq("k_h", "v_h", "v_k")) {
      val Array(a, b) = pair.split("_")
      val (xs, ys) = (feats(a), feats(b))
      val (sx, sy) = (xs.map(BigInt(_)).sum.toDouble, ys.map(BigInt(_)).sum.toDouble)
      val sxy = xs.zip(ys).map { case (x, y) => BigInt(x) * BigInt(y) }.sum.toDouble
      val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum.toDouble
      val syy = ys.map(y => BigInt(y) * BigInt(y)).sum.toDouble
      val cov = (sxy - sx * sy / n) / n
      val (vx, vy) = (sxx - sx * sx / n, syy - sy * sy / n)
      val (gn, gcov, gcorr) = got(pair)
      assert(gn == rows.length.toLong)
      assert(math.abs(gcov - cov) < math.abs(cov) * 1e-9 + 1e-4, s"$pair cov")
      if (vx > 0 && vy > 0)
        assert(math.abs(gcorr.get - cov * n / math.sqrt(vx * vy)) < 1e-3,
          s"$pair corr")
    }
  }

  test("moving_median_7d equals the sliding-sorted-frame median") {
    val daily = events.groupBy(e => (e._4, dayNum(e._2)))
      .view.mapValues(_.map(x => cents(x._5)).sum).toMap
    val got = run("moving_median_7d").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    val exp = daily.keys.map(_._1).toSeq.distinct.flatMap { t =>
      val series = daily.collect { case ((`t`, d), s) => (d, s) }.toSeq.sortBy(_._1)
      series.indices.map { i =>
        val frame = series.slice(math.max(0, i - 6), i + 1).map(_._2).sorted
        (t, series(i)._1) -> ((series(i)._2, frame((frame.size + 1) / 2 - 1)))
      }
    }.toMap
    assert(got == exp)
  }

  test("theil_index: T ≥ 0, equals the count-weighted fold, 0 for uniform") {
    val byType = events.filter(e => cents(e._5) > 0).groupBy(_._4)
      .view.mapValues(_.map(e => cents(e._5))).toMap
    val got = run("theil_index").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    byType.foreach { case (t, xs) =>
      val n = xs.length
      val mu = xs.map(BigInt(_)).sum.toDouble / n
      val exp = xs.map(x => (x / mu) * math.log(x / mu)).sum / n
      assert(got(t)._1 == n.toLong)
      assert(math.abs(got(t)._2 - exp) < 1e-3, s"$t: got ${got(t)._2} want $exp")
      assert(got(t)._2 >= -1e-9, s"$t: Theil T must be non-negative")
    }
  }

  test("doc_length_stats equals nearest-rank percentile selection") {
    val got = run("doc_length_stats").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val exp = docsRows.groupBy(d => (d._1, d._2)).map { case (k, ds) =>
      val lens = ds.map(_._3).sorted
      def sel(q: Double) = lens(math.ceil(q * lens.size).toInt - 1)
      k -> ((lens.size.toLong, lens.sum, sel(0.50), sel(0.90)))
    }
    assert(got == exp)
  }
}
