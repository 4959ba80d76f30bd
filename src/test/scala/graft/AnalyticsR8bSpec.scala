package graft

/** Round-8 additions (#157-#164): each checked against an independent
  * Scala re-derivation of the semantics at sf0.001 (the oracle SQL is
  * the driver gate's job; these pin the meaning).
  */
class AnalyticsR8bSpec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4)))

  private def docsRows =
    graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  // HALF_UP: both engines' round() breaks exact .00005 ties away from zero
  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("autocorr_daily equals Pearson r of the lagged daily series") {
    val daily = events.groupBy(r => (r._4, dayNum(r._2)))
      .view.mapValues(_.map(e => cents(e._5)).sum).toMap
    val got = run("autocorr_daily").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_ => r.getDouble(3))))).toMap
    for (t <- daily.keys.map(_._1).toSeq.distinct; k <- Seq(1L, 2L, 3L, 7L)) {
      val s = daily.collect { case ((`t`, d), v) => (d, v) }.toSeq.sortBy(_._1)
        .map(_._2)
      val pairs = s.drop(k.toInt).zip(s.dropRight(k.toInt))
      if (pairs.isEmpty) assert(!got.contains((t, k)))
      else {
        val (n, xs, ys) = (pairs.length.toDouble, pairs.map(_._1), pairs.map(_._2))
        val (sx, sy) = (xs.map(BigInt(_)).sum, ys.map(BigInt(_)).sum)
        val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
        val syy = ys.map(y => BigInt(y) * BigInt(y)).sum
        val sxy = pairs.map { case (x, y) => BigInt(x) * BigInt(y) }.sum
        val vx = n * sxx.toDouble - sx.toDouble * sx.toDouble
        val vy = n * syy.toDouble - sy.toDouble * sy.toDouble
        val exp = if (vx > 0 && vy > 0)
          Some(r4((n * sxy.toDouble - sx.toDouble * sy.toDouble)
            / math.sqrt(vx * vy)))
        else None
        val (gn, gr) = got((t, k))
        assert(gn == pairs.length.toLong, s"($t,$k) pair count")
        assert(gr.map(r4) == exp, s"($t,$k): got $gr want $exp")
      }
    }
  }

  test("gini_inequality equals the O(n²) mean-absolute-difference definition") {
    val byType = events.filter(e => cents(e._5) > 0).groupBy(_._4)
      .view.mapValues(_.map(e => cents(e._5))).toMap
    val got = run("gini_inequality").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    byType.foreach { case (t, xs) =>
      val n = xs.length
      val sumAbs = (for (a <- xs; b <- xs) yield (BigInt(a) - BigInt(b)).abs).sum
      val exp = r4(sumAbs.toDouble / 2
        / (n.toDouble * xs.map(BigInt(_)).sum.toDouble))
      assert(got(t)._1 == n.toLong && r4(got(t)._2) == exp, s"$t")
    }
  }

  test("profile_columns: one row per column, counts match the data") {
    val ev = graft.sources.Tables(spark, sfDir, "events")
    val n = ev.count()
    val got = run("profile_columns").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got.keySet ==
      Set("event_id", "event_type", "props", "ts", "user_id", "value"))
    got.values.foreach { case (nr, _, _) => assert(nr == n) }
    assert(got("event_id")._3 == n) // pk: all distinct
    val distinctTypes = ev.select("event_type").distinct().count()
    assert(got("event_type")._3 == distinctTypes)
  }

  test("text_ttr equals the per-doc token/type/hapax fold") {
    val got = run("text_ttr").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val exp = docsRows.filter(_._1 < 200).map { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val byTok = toks.groupBy(identity).view.mapValues(_.size).toMap
      val hapax = byTok.count(_._2 == 1)
      id -> ((toks.size.toLong, byTok.size.toLong,
        r4(byTok.size.toDouble / toks.size),
        r4(hapax.toDouble / byTok.size)))
    }.toMap
    assert(got == exp)
  }

  test("shingle_novelty: df≥2 fraction over distinct 3-gram hashes") {
    // re-derive WITHOUT the hash: raw shingle strings give identical df
    // structure (h32 collisions would only merge shingles — assert the
    // hashed result matches the raw-string derivation, so any collision
    // at this SF would surface as a mismatch)
    val sh = docsRows.map { case (id, text) =>
      val ws = text.split(" ", -1).toSeq
      id -> ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    val df = sh.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val exp = sh.map { case (id, set) =>
      id -> ((set.size.toLong,
        r4(set.count(df(_) >= 2).toDouble / set.size)))
    }.toMap
    val got = run("shingle_novelty").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == exp)
  }

  test("contingency_coef: C and T from the chi2 of the contingency grid") {
    val row = run("contingency_coef").collect()(0)
    val (n, chi2, c, tt) = (row.getLong(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    assert(n == events.length.toLong)
    assert(c > 0 && c < 1, "Pearson C in (0,1)")
    assert(tt >= 0 && tt <= 1, "Tschuprow T in [0,1]")
    assert(r4(math.sqrt(chi2 / (chi2 + n))) == r4(c) ||
      math.abs(math.sqrt(chi2 / (chi2 + n)) - c) < 2e-4,
      "C consistent with reported chi2")
  }

  test("mean_family: harmonic ≤ geometric ≤ arithmetic, values match fold") {
    val byType = events.filter(e => cents(e._5) > 0).groupBy(_._4)
      .view.mapValues(_.map(e => cents(e._5))).toMap
    val got = run("mean_family").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    byType.foreach { case (t, cs) =>
      val (n, ma, mg, mh) = got(t)
      assert(n == cs.length.toLong)
      assert(mh <= mg + 1e-9 && mg <= ma + 1e-9, s"$t: AM-GM-HM order")
      val expA = r4(cs.map(BigInt(_)).sum.toDouble / 100 / cs.length)
      assert(math.abs(ma - expA) < 1e-9, s"$t arithmetic")
      val expG = math.exp(cs.map(c => math.log(c / 100.0)).sum / cs.length)
      assert(math.abs(mg - expG) < 1e-3, s"$t geometric")
    }
  }

  test("interarrival_quantiles: nearest-rank selection over exact gaps") {
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000 + (ts.getNanos / 1000) % 1000 // full µs precision
    val gaps = events.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (us(e._2), e._3))
      sorted.drop(1).zip(sorted.dropRight(1)).map { case (cur, prev) =>
        cur._4 -> java.lang.Math.floorDiv(us(cur._2) - us(prev._2), 1000000L)
      }
    }.toSeq
    val got = run("interarrival_quantiles").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    gaps.groupBy(_._1).foreach { case (t, g) =>
      val xs = g.map(_._2).sorted
      def sel(q: Double) = xs(math.ceil(q * xs.size).toInt - 1)
      assert(got(t) ==
        ((xs.size.toLong, sel(0.50), sel(0.90), sel(0.99))), s"$t")
    }
  }
}
