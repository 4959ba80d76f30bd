package graft

/** Round-8 second batch (#165-#169): independent Scala re-derivations of
  * the semantics at sf0.001 (the oracle SQL is the driver gate's job;
  * these pin the meaning).
  */
class AnalyticsR8cSpec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type", "value", "props")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  private def kOf(props: String): Option[Long] =
    "\"k\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(props).map(_.group(1).toLong)

  // HALF_UP: both engines' round() breaks exact ties away from zero
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("kl_divergence ≥ 0, equals the plug-in fold, and exceeds nothing JSD-like") {
    val cells = events.flatMap(e => kOf(e._6).map(k => (e._4, k / 10)))
    val byTB = cells.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val byT = cells.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val byB = cells.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tot = cells.length.toDouble
    val got = run("kl_divergence").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    byT.keys.foreach { t =>
      val exp = byTB.collect { case ((`t`, b), n) =>
        val p = n.toDouble / byT(t)
        val q = byB(b) / tot
        p * math.log(p / q)
      }.sum
      assert(math.abs(got(t) - exp) < 1e-3, s"$t: got ${got(t)} want $exp")
      assert(got(t) >= -1e-9, s"$t: KL must be non-negative")
    }
  }

  test("cliffs_delta equals the O(n²) dominance-pair definition") {
    def centsD(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val xs = events.filter(_._4 == "click").map(e => centsD(e._5))
    val ys = events.filter(_._4 == "view").map(e => centsD(e._5))
    val gt = (for (x <- xs; y <- ys) yield if (x > y) 1L else 0L).sum
    val lt = (for (x <- xs; y <- ys) yield if (x < y) 1L else 0L).sum
    val row = run("cliffs_delta").collect()(0)
    assert(row.getLong(0) == xs.length.toLong && row.getLong(1) == ys.length.toLong)
    assert(row.getLong(2) == gt && row.getLong(3) == lt)
    assert(r4(row.getDouble(4)) ==
      r4((gt - lt).toDouble / (xs.length.toDouble * ys.length)))
  }

  test("max_streak equals the scan-the-sorted-days fold") {
    def streaks(days: Seq[Long]): (Long, Long) = {
      var maxLen = 0L; var cur = 0L; var islands = 0L; var prev = Long.MinValue
      days.foreach { d =>
        if (d == prev + 1) cur += 1
        else { islands += 1; cur = 1 }
        if (cur > maxLen) maxLen = cur
        prev = d
      }
      (maxLen, islands)
    }
    val exp = events.groupBy(_._1).map { case (u, es) =>
      u -> streaks(es.map(e => dayNum(e._2)).distinct.sorted)
    }
    val got = run("max_streak").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp)
  }

  test("audience_overlap equals per-pair set intersection") {
    val byType = events.groupBy(_._4).view.mapValues(_.map(_._1).toSet).toMap
    val types = byType.keys.toSeq.sorted
    val exp = (for {
      i <- types.indices; j <- (i + 1) until types.size
      (a, b) = (types(i), types(j))
      common = (byType(a) & byType(b)).size.toLong
    } yield (a, b) -> ((common, byType(a).size.toLong, byType(b).size.toLong,
      r4(common.toDouble / (byType(a) ++ byType(b)).size)))).toMap
    val got = run("audience_overlap").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // pairs with zero common users are absent on both sides (inner join)
    assert(got == exp.filter(_._2._1 > 0))
  }

  test("type_transitions: rows are a proper conditional distribution") {
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
    val pairs = events.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (us(e._2), e._3))
      sorted.drop(1).zip(sorted.dropRight(1)).map { case (cur, prev) =>
        (prev._4, cur._4)
      }
    }.toSeq
    val exp = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val margins = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = run("type_transitions").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.view.mapValues(_._1).toMap == exp)
    got.foreach { case ((p, _), (n, prob)) =>
      assert(r4(n.toDouble / margins(p)) == r4(prob))
    }
    // each prev row's probabilities sum to ~1
    got.keys.map(_._1).toSeq.distinct.foreach { p =>
      val s = got.collect { case ((`p`, _), (_, prob)) => prob }.sum
      assert(math.abs(s - 1.0) < 5e-4, s"$p: Σp = $s")
    }
  }
}
