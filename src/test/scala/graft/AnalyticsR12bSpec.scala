package graft

/** #293-#300 r12 additions: each pinned against an independent Scala
  * re-derivation at sf0.001 (the DuckDB oracle is the driver gate's job;
  * these pin the semantics).
  */
class AnalyticsR12bSpec extends SparkSpecBase {

  private def cents(v: Double): BigDecimal =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  private def dayOf(ts: java.sql.Timestamp): Long =
    Math.floorDiv(Math.floorDiv(ts.getTime, 1000L), 86400L)

  private def hourOf(ts: java.sql.Timestamp): Long =
    Math.floorDiv(Math.floorDiv(ts.getTime, 1000L), 3600L)

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("event_id", "event_type", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        r.getDouble(3)))

  /** Daily DECIMAL net flow per (type, day), sorted by day. */
  private lazy val daily: Map[String, Seq[(Long, BigDecimal)]] =
    events.groupBy(_._2).map { case (t, rs) =>
      t -> rs.groupBy(e => dayOf(e._3)).toSeq
        .map { case (d, es) => (d, es.map(e => cents(e._4)).sum) }
        .sortBy(_._1)
    }

  test("lead_lag_corr: pairwise daily corr at lags -3..3, n>=10") {
    val types = daily.keys.toSeq.sorted
    val exp = (for {
      i <- types.indices; j <- (i + 1) until types.size
      a = types(i); b = types(j)
      bm = daily(b).toMap
      lagv <- -3L to 3L
      matched = daily(a).flatMap { case (d, x) =>
        bm.get(d + lagv).map(y => (x, y)) }
      if matched.size >= 10
    } yield {
      val n = matched.size
      val sx = matched.map(_._1).sum.toDouble
      val sy = matched.map(_._2).sum.toDouble
      val sxy = matched.map(p => p._1 * p._2).sum.toDouble
      val sxx = matched.map(p => p._1 * p._1).sum.toDouble
      val syy = matched.map(p => p._2 * p._2).sum.toDouble
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      val cxy = n * sxy - sx * sy
      ((a, b, lagv), (n.toLong, dx, dy, cxy))
    }).collect { case (k, (n, dx, dy, cxy)) if dx > 0 && dy > 0 =>
      k -> ((n, r4(cxy / math.sqrt(dx * dy))))
    }.toMap
    val got = run("lead_lag_corr").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, (n, x)) =>
      assert(got(k)._1 == n, s"n $k")
      assert(math.abs(got(k)._2 - x) < 2e-4, s"xcorr $k: ${got(k)._2} vs $x")
    }
    // non-vacuity: all C(5,2)=10 pairs x 7 lags should survive at sf0.001
    assert(got.size == 70)
  }

  test("jarque_bera: gap-aware integer-cent deltas, g1/g2/JB chain") {
    val exp = daily.flatMap { case (t, cells) =>
      val ks = cells.zip(cells.drop(1)).collect {
        case ((d0, v0), (d1, v1)) if d1 - d0 == 1 =>
          ((v1 - v0) * 100).toBigInt
      }
      val n = ks.size
      if (n < 8) None
      else {
        val s1 = ks.sum.toDouble
        val s2 = ks.map(k => k * k).sum.toDouble
        val s3 = ks.map(k => k * k * k).sum.toDouble
        val s4 = ks.map(k => k * k * k * k).sum.toDouble
        val mean = s1 / n
        val m2 = s2 / n - mean * mean
        if (m2 <= 0) None
        else {
          val m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean
          val m4 = s4 / n - 4 * mean * (s3 / n) +
            6 * (mean * mean) * (s2 / n) -
            3 * ((mean * mean) * (mean * mean))
          val g1 = m3 / (m2 * math.sqrt(m2))
          val g2 = m4 / (m2 * m2) - 3
          Some(t -> ((n.toLong, r4(g1), r4(g2),
            r4(n / 6.0 * (g1 * g1 + g2 * g2 / 4)))))
        }
      }
    }
    val got = run("jarque_bera").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, (n, g1, g2, jb)) =>
      assert(got(t)._1 == n, s"n $t")
      assert(math.abs(got(t)._2 - g1) < 2e-4, s"g1 $t")
      assert(math.abs(got(t)._3 - g2) < 2e-4, s"g2 $t")
      assert(math.abs(got(t)._4 - jb) < 2e-3, s"jb $t")
    }
    assert(got.nonEmpty)
  }

  test("jarque_bera drops out-of-premise deltas instead of overflowing") {
    // The |k| <= 1e8-cent bound is the shared degradation mode (r13/r14
    // advice): a daily jump past it must be FILTERED on both engines —
    // never Spark-DECIMAL-overflow-to-NULL vs DuckDB-HUGEINT-error. The
    // oracle carries the identical WHERE textually; this pins the Spark
    // side on a synthetic over-bound day.
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("jb_bound").toString
    def ts(day: Int) = new java.sql.Timestamp(day * 86400000L)
    // type "x": days 0-9 small varying values, day 10 a 2e6-dollar spike
    // (delta 2e8 cents > bound, and day 11's return delta too), days 11-13
    // back to small — 13 gap-1 deltas, 2 dropped, 11 in-premise (>= 8)
    val rows = (0 to 9).map(d => (d.toLong, ts(d), 1L, "x", 100.0 + d * 3.7 + (d % 3) * 11.13, "{}")) ++
      Seq((10L, ts(10), 1L, "x", 2000000.0, "{}")) ++
      (11 to 13).map(d => (d.toLong, ts(d), 1L, "x", 90.0 + d * 5.21 + (d % 2) * 7.77, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("jarque_bera")(spark, tmp).collect()
    assert(got.length == 1 && got(0).getString(0) == "x")
    // 11 surviving deltas — the two over-bound ones dropped, not NULLed
    assert(got(0).getLong(1) == 11L, s"n=${got(0).getLong(1)}")
    Seq(2, 3, 4).foreach { i =>
      assert(!got(0).isNullAt(i) && !got(0).getDouble(i).isNaN,
        s"col $i poisoned by the over-bound delta")
    }
  }

  test("hurst_exponent: hourly rank blocks, complete-block variances") {
    val hourly: Map[String, Seq[BigDecimal]] =
      events.groupBy(_._2).map { case (t, rs) =>
        t -> rs.groupBy(e => hourOf(e._3)).toSeq
          .map { case (h, es) => (h, es.map(e => cents(e._4)).sum) }
          .sortBy(_._1).map(_._2)
      }
    val exp = hourly.flatMap { case (t, vs) =>
      val vars = Seq(1, 2, 4, 8, 16).flatMap { m =>
        val blocks = vs.grouped(m).filter(_.size == m).map(_.sum).toSeq
        val nb = blocks.size
        if (nb < 4) None
        else {
          val sb = blocks.sum.toDouble
          val qb = blocks.map(b => (b * b).toDouble).sum
          val v = (qb - sb * sb / nb) / (nb - 1)
          if (v > 0) Some(m -> v) else None
        }
      }.toMap
      if (vars.size != 5) None
      else Some(t -> ((5L,
        r4((-2 * math.log(vars(1)) - math.log(vars(2)) + math.log(vars(8))
          + 2 * math.log(vars(16))) / (20 * math.log(2.0))))))
    }
    val got = run("hurst_exponent").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, (n, h)) =>
      assert(got(t)._1 == n, s"n_scales $t")
      assert(math.abs(got(t)._2 - h) < 2e-4, s"hurst $t: ${got(t)._2} vs $h")
    }
    // the hour grain must make the estimator non-vacuous from sf0.001 up
    assert(got.size == 5)
  }

  test("rsi_daily: gap-aware gains/losses, trailing RANGE-14 sum") {
    val exp = daily.flatMap { case (t, cells) =>
      val moves = cells.zip(cells.drop(1)).collect {
        case ((d0, v0), (d1, v1)) if d1 - d0 == 1 =>
          (d1,
            if (v1 > v0) v1 - v0 else BigDecimal(0),
            if (v1 < v0) v0 - v1 else BigDecimal(0))
      }
      moves.flatMap { case (d, _, _) =>
        val win = moves.filter(m => m._1 >= d - 13 && m._1 <= d)
        val sg = win.map(_._2).sum; val sl = win.map(_._3).sum
        if (win.size >= 7 && sg + sl > 0)
          Some((t, d) -> ((win.size.toLong,
            r4(100.0 * sg.toDouble / (sg.toDouble + sl.toDouble)))))
        else None
      }
    }
    val got = run("rsi_daily").collect().map(r =>
      (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, v) =>
      assert(got(k)._1 == v._1, s"n_win $k")
      assert(math.abs(got(k)._2 - v._2) < 2e-4, s"rsi $k")
    }
    assert(got.nonEmpty)
  }

  test("bollinger_breach: trailing-20d band flags, per-type counts") {
    val exp = daily.map { case (t, cells) =>
      val flags = cells.flatMap { case (d, v) =>
        val win = cells.filter(c => c._1 >= d - 19 && c._1 <= d)
        val n = win.size
        if (n < 5) None
        else {
          val sw = win.map(_._2).sum.toDouble
          val qw = win.map(c => (c._2 * c._2).toDouble).sum
          val mu = sw / n
          val sd = math.sqrt((qw - sw * sw / n) / (n - 1))
          val vd = v.toDouble
          Some((if (vd > mu + 2 * sd) 1L else 0L,
            if (vd < mu - 2 * sd) 1L else 0L))
        }
      }
      val up = flags.map(_._1).sum; val dn = flags.map(_._2).sum
      t -> ((flags.size.toLong, up, dn,
        r6((up + dn).toDouble / flags.size)))
    }
    val got = run("bollinger_breach").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, v) => assert(got(t) == v, s"type $t") }
    assert(got.nonEmpty)
  }

  test("chow_break: median-day split, pooled vs segment SSR F-chain") {
    def ssr(pts: Seq[(Long, BigDecimal)]): Option[Double] = {
      val n = pts.size
      val sx = pts.map(_._1).sum.toDouble
      val sxx = pts.map(p => BigInt(p._1) * BigInt(p._1)).sum.toDouble
      val sy = pts.map(_._2).sum.toDouble
      val syy = pts.map(p => (p._2 * p._2).toDouble).sum
      val sxy = pts.map(p => (p._2 * p._1).toDouble).sum
      val dxx = sxx - sx * sx / n
      if (dxx <= 0) None
      else Some((syy - sy * sy / n) -
        (sxy - sx * sy / n) * (sxy - sx * sy / n) / dxx)
    }
    val exp = daily.flatMap { case (t, cells) =>
      val n = cells.size
      val splitD = cells((n - 1) / 2)._1 // min d with 2*rn >= n (rn 1-based)
      val h1 = cells.filter(_._1 <= splitD); val h2 = cells.filter(_._1 > splitD)
      if (h1.size < 3 || h2.size < 3) None
      else for {
        s1 <- ssr(h1); s2 <- ssr(h2); sp <- ssr(cells)
        s12 = s1 + s2
        if s12 > 0
      } yield t -> ((n.toLong, r4(((sp - s12) / 2) / (s12 / (n - 4)))))
    }
    val got = run("chow_break").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, (n, f)) =>
      assert(got(t)._1 == n, s"n $t")
      assert(math.abs(got(t)._2 - f) < 2e-3, s"F $t: ${got(t)._2} vs $f")
    }
    assert(got.nonEmpty)
  }

  /** The parity.md5Long spelling: first 15 md5 hex chars as a long. */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("bootstrap_mean_ci: deterministic Poisson weights, picked rank CI") {
    val thresholds =
      Seq(367879L, 735759L, 919699L, 981012L, 996340L, 999406L, 999917L)
    def poisson(r: Long): Long = thresholds.count(_ <= r).toLong
    // the one-md5 + affine-mix draw (BootA/BootB = seed60-derived)
    val P = graft.functions.MinHashAgg.Prime
    val bootA = (0 until 64).map(b =>
      graft.functions.MinHashAgg.seed60(s"boot:a:$b") % (P - 1) + 1)
    val bootB = (0 until 64).map(b =>
      graft.functions.MinHashAgg.seed60(s"boot:b:$b") % P)
    val byType = events.groupBy(_._2)
    val exp = byType.flatMap { case (t, rs) =>
      val means = (0 until 64).flatMap { b =>
        val wv = rs.map { e =>
          val h = md5Long(s"${e._1}") % 4294967296L
          val w = poisson((bootA(b) * h + bootB(b)) % P % 1000000L)
          (w, cents(e._4) * w)
        }
        val sw = wv.map(_._1).sum
        if (sw > 0) Some((b, wv.map(_._2).sum.toDouble / sw)) else None
      }
      if (means.size != 64) None
      else {
        val ranked = means.sortBy(p => (p._2, p._1)).map(_._2)
        val mean = rs.map(e => cents(e._4)).sum.toDouble / rs.size
        Some(t -> ((rs.size.toLong, r6(mean), r6(ranked(1)), r6(ranked(62)))))
      }
    }
    val got = run("bootstrap_mean_ci").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, v) =>
      assert(got(t)._1 == v._1, s"n $t")
      assert(math.abs(got(t)._2 - v._2) < 2e-6, s"mean $t")
      assert(math.abs(got(t)._3 - v._3) < 2e-6, s"ci_lo $t")
      assert(math.abs(got(t)._4 - v._4) < 2e-6, s"ci_hi $t")
      assert(v._3 <= v._2 && v._2 <= v._4, s"CI brackets the mean $t")
    }
    assert(got.size == 5)
  }

  test("langid_kappa: kappa chain agrees with the lang_confusion matrix") {
    val conf = run("lang_confusion").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nDocs = conf.map(_._3).sum
    val nAgree = conf.collect { case (a, p, n) if a == p => n }.sum
    val rowT = conf.groupBy(_._1).map { case (l, rs) => l -> rs.map(_._3).sum }
    val colT = conf.groupBy(_._2).map { case (l, rs) => l -> rs.map(_._3).sum }
    val labels = rowT.keySet ++ colT.keySet
    val pe = labels.toSeq.map(l =>
      rowT.getOrElse(l, 0L).toDouble * colT.getOrElse(l, 0L)).sum /
      nDocs.toDouble / nDocs
    val po = nAgree.toDouble / nDocs
    val row = run("langid_kappa").collect().head
    assert(row.getLong(0) == nDocs)
    assert(row.getLong(1) == nAgree)
    assert(math.abs(row.getDouble(2) - po) < 2e-6, "po")
    assert(math.abs(row.getDouble(3) - pe) < 2e-6, "pe")
    assert(math.abs(row.getDouble(4) - (po - pe) / (1 - pe)) < 2e-6, "kappa")
    // The fixture's declared lang column is synthetic noise w.r.t. the text,
    // so raw agreement po sits near chance (pe) and the chance-corrected
    // kappa must report ~0 — THE property that distinguishes kappa from po.
    assert(po > 0.05 && pe > 0.05)
    assert(math.abs(row.getDouble(4)) < 0.1)
    assert(math.abs(row.getDouble(4)) < po, "kappa strictly below raw po")
  }
}
