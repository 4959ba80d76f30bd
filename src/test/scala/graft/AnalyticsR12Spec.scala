package graft

/** #286-#289 r12 additions: each pinned against an independent Scala
  * re-derivation at sf0.001 (the DuckDB oracle is the driver gate's job;
  * these pin the semantics).
  */
class AnalyticsR12Spec extends SparkSpecBase {

  private def cents(v: Double): BigDecimal =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  private def dayOf(ts: java.sql.Timestamp): Long =
    Math.floorDiv(Math.floorDiv(ts.getTime, 1000L), 86400L)

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("event_type", "ts", "value")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))

  /** Daily DECIMAL net flow per (type, day), the #286/#288 base grain. */
  private lazy val daily: Map[String, Seq[(Long, BigDecimal)]] =
    events.groupBy(_._1).map { case (t, rs) =>
      t -> rs.groupBy(e => dayOf(e._2)).toSeq
        .map { case (d, es) => (d, es.map(e => cents(e._3)).sum) }
        .sortBy(_._1)
    }

  test("rolling_sharpe: trailing-7d RANGE window, decimal moments, n>=3") {
    val exp = daily.flatMap { case (t, cells) =>
      cells.map { case (d, _) =>
        val win = cells.filter(c => c._1 >= d - 6 && c._1 <= d)
        val n = win.size
        val s = win.map(_._2).sum
        val q = win.map(c => c._2 * c._2).sum
        (t, d, n, s, q)
      }.filter(_._3 >= 3).flatMap { case (t, d, n, s, q) =>
        val sd = s.toDouble; val qd = q.toDouble
        val v = (qd - sd * sd / n) / (n - 1)
        if (v > 0) Some((t, d) -> ((n.toLong, r4((sd / n) / math.sqrt(v)))))
        else None
      }
    }
    val got = run("rolling_sharpe").collect().map(r =>
      (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, v) => assert(got(k) == v, s"window $k") }
    assert(got.nonEmpty)
  }

  test("levene_test: Brown-Forsythe W from exact medians and decimal z") {
    val byType = events.groupBy(_._1)
    val medians = byType.map { case (t, rs) =>
      val vs = rs.map(e => cents(e._3)).sorted
      val n = vs.size
      // lower median = smallest v with 2*rank >= n (the mad_exact selection)
      t -> vs((n - 1) / 2)
    }
    val z = events.map(e => (e._1, (cents(e._3) - medians(e._1)).abs))
    val zg = z.groupBy(_._1).map { case (t, zs) =>
      (t, zs.size.toLong, zs.map(_._2).sum, zs.map(x => x._2 * x._2).sum)
    }.toSeq.sortBy(_._1)
    val k = zg.size; val n = zg.map(_._2).sum
    val s = zg.map(_._3).sum.toDouble
    val q = zg.map(_._4).sum.toDouble
    val a = zg.map(g => g._3.toDouble * g._3.toDouble / g._2).sum
    val expW = r4(((a - s * s / n) / (k - 1)) / ((q - a) / (n - k)))
    val row = run("levene_test").collect().head
    assert(row.getLong(0) == k.toLong)
    assert(row.getLong(1) == n)
    assert(math.abs(row.getDouble(2) - expW) < 2e-4,
      s"W ${row.getDouble(2)} vs $expW") // a-sum order may differ at 1ulp
  }

  test("seasonal_error: gap-checked lags, exact-decimal MAE/MASE chain") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = daily.flatMap { case (t, cells) =>
      val idx = cells.zipWithIndex
      val ev = idx.flatMap { case ((d, v), i) =>
        if (i >= 7) {
          val (d7, y7) = cells(i - 7); val (d1, y1) = cells(i - 1)
          if (d - d7 == 7 && d - d1 == 1)
            Some(((v - y7).abs, (v - y7) * (v - y7), (v - y1).abs))
          else None
        } else None
      }
      if (ev.isEmpty) None
      else {
        val n = ev.size
        val se7 = ev.map(_._1).sum.toDouble
        val sq = ev.map(_._2).sum.toDouble
        val se1 = ev.map(_._3).sum.toDouble
        Some(t -> ((n.toLong, r6(se7 / n), r6(math.sqrt(sq / n)),
          if (se1 > 0) Some(r6((se7 / n) / (se1 / n))) else None)))
      }
    }
    val got = run("seasonal_error").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, v) => assert(got(t) == v, s"type $t") }
    assert(got.nonEmpty)
  }

  test("runs_test: gap-aware sign runs, classical z") {
    val exp = daily.flatMap { case (t, cells) =>
      val signs = cells.zip(cells.drop(1)).collect {
        case ((d0, v0), (d1, v1)) if d1 - d0 == 1 && v1 != v0 =>
          if (v1 > v0) 1 else -1
      }
      val nUp = signs.count(_ == 1).toLong
      val nDn = signs.count(_ == -1).toLong
      if (nUp == 0 || nDn == 0 || nUp + nDn <= 1) None
      else {
        val runs = 1L + signs.zip(signs.drop(1)).count(p => p._1 != p._2)
        val n = (nUp + nDn).toDouble
        val mu = 2.0 * nUp * nDn / n + 1
        val vr = 2.0 * nUp * nDn * (2.0 * nUp * nDn - nUp - nDn) /
          (n * n * (n - 1))
        if (vr > 0) Some(t -> ((nUp, nDn, runs, r4((runs - mu) / math.sqrt(vr)))))
        else None
      }
    }
    val got = run("runs_test").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, v) =>
      val g = got(t)
      assert(g._1 == v._1 && g._2 == v._2 && g._3 == v._3, s"counts $t")
      assert(math.abs(g._4 - v._4) < 2e-4, s"z $t: ${g._4} vs ${v._4}")
    }
    assert(got.nonEmpty)
  }

  test("theil_sen_trend: lower median of pairwise slopes, picked exactly") {
    val exp = daily.filter(_._2.size >= 2).map { case (t, cells) =>
      val slopes = (for {
        i <- cells.indices; j <- (i + 1) until cells.size
      } yield (cells(j)._2 - cells(i)._2).toDouble /
        (cells(j)._1 - cells(i)._1)).sorted
      t -> ((slopes.size.toLong, slopes((slopes.size - 1) / 2)))
    }
    val got = run("theil_sen_trend").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, v) => assert(got(t) == v, s"type $t") }
  }

  test("mann_kendall_trend: S, tie-corrected var, continuity z, tau") {
    val exp = daily.map { case (t, cells) =>
      val n = cells.size.toLong
      var sStat = 0L
      for (i <- cells.indices; j <- (i + 1) until cells.size) {
        val c = cells(j)._2.compare(cells(i)._2)
        sStat += (if (c > 0) 1 else if (c < 0) -1 else 0)
      }
      val nPairs = n * (n - 1) / 2
      val tcorr = cells.groupBy(_._2).values.map(_.size.toLong)
        .filter(_ > 1).map(tt => tt * (tt - 1) * (2 * tt + 5)).sum
      val vr = (n * (n - 1) * (2 * n + 5) - tcorr) / 18.0
      val z = if (sStat > 0) (sStat - 1) / math.sqrt(vr)
        else if (sStat < 0) (sStat + 1) / math.sqrt(vr) else 0.0
      t -> ((n, sStat, nPairs, r4(sStat.toDouble / nPairs), r4(z)))
    }
    val got = run("mann_kendall_trend").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, v) =>
      val g = got(t)
      assert((g._1, g._2, g._3) == ((v._1, v._2, v._3)), s"ints $t")
      assert(math.abs(g._4 - v._4) < 2e-4 && math.abs(g._5 - v._5) < 2e-4,
        s"tau/z $t")
    }
  }

  test("vocab_jaccard_sources: distinct-grain intersection over all pairs") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val vocab = docs.groupBy(_._1).map { case (s, ds) =>
      s -> ds.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty).toSet
    }
    val srcs = vocab.keys.toSeq.sorted
    val exp = (for {
      i <- srcs.indices; j <- (i + 1) until srcs.size
      a = srcs(i); b = srcs(j)
      inter = (vocab(a) & vocab(b)).size
    } yield (a, b) -> ((vocab(a).size.toLong, vocab(b).size.toLong,
      inter.toLong,
      BigDecimal(inter.toDouble / (vocab(a).size + vocab(b).size - inter))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
    val got = run("vocab_jaccard_sources").collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, v) => assert(got(k) == v, s"pair $k") }
    assert(got.size >= 3) // at least 3 source pairs in the fixture
  }
}
