package graft

import org.apache.spark.sql.functions._

/** Round-7 additions (#135-#142): each checked against an independent
  * Scala re-derivation of the semantics at sf0.001 (the oracle SQL is
  * the driver gate's job; these pin the meaning).
  */
class AnalyticsR7Spec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type", "value", "props")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))

  private def docTexts =
    graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  // DuckDB date_part('dow'): Sunday=0..Saturday=6; java DayOfWeek 1=Mon..7=Sun
  private def dow(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).getDayOfWeek.getValue % 7

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def kOf(props: String): Long =
    "\"k\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(props).get.group(1).toLong

  test("cohort_retention: per-user first week + distinct-week offsets") {
    val uw = events.map(r => (r._1, dayNum(r._2) / 7)).distinct
    val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val exp = uw.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
      .map { case (k, v) => k -> v.length.toLong }
    val got = run("cohort_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == exp)
    assert(exp.keys.exists(_._2 > 0), "no returning users — retention vacuous")
  }

  test("linreg_2f: Cramer normal-equations over exact moment sums") {
    val got = run("linreg_2f").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    events.groupBy(_._4).foreach { case (et, rs) =>
      val n = rs.length.toDouble
      val ys = rs.map(r => cents(r._5)); val ks = rs.map(r => kOf(r._6))
      val ws = rs.map(r => dow(r._2))
      def s(xs: Seq[Long]) = xs.map(BigInt(_)).sum.toDouble
      def sp(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum.toDouble
      val (sk, sw, sy) = (s(ks), s(ws), s(ys))
      val (skk, sww, skw) = (sp(ks, ks), sp(ws, ws), sp(ks, ws))
      val (sky, swy) = (sp(ks, ys), sp(ws, ys))
      val det = n * (skk * sww - skw * skw) - sk * (sk * sww - skw * sw) +
        sw * (sk * skw - skk * sw)
      val b0 = (sy * (skk * sww - skw * skw) - sk * (sky * sww - skw * swy) +
        sw * (sky * skw - skk * swy)) / det
      val bK = (n * (sky * sww - skw * swy) - sy * (sk * sww - skw * sw) +
        sw * (sk * swy - sky * sw)) / det
      val bW = (n * (skk * swy - sky * skw) - sk * (sk * swy - sky * sw) +
        sy * (sk * skw - skk * sw)) / det
      val (gn, g0, gk, gw) = got(et)
      assert(gn == rs.length.toLong, s"$et n")
      assert(math.abs(g0 - b0) <= 2e-4, s"$et b0: got=$g0 exp=$b0")
      assert(math.abs(gk - bK) <= 2e-4, s"$et b_k: got=$gk exp=$bK")
      assert(math.abs(gw - bW) <= 2e-4, s"$et b_dow: got=$gw exp=$bW")
      // regression must actually engage: k explains value in the fixture
      assert(math.abs(bK) > 1e-3, s"$et b_k ~ 0 — feature vacuous")
    }
  }

  test("cramers_v_corrected: Bergsma correction over the re-derived table") {
    val cells = events.groupBy(r => (r._4, kOf(r._6) / 10))
      .map { case (k, v) => k -> v.length.toDouble }
    val n = events.length.toDouble
    val rowM = cells.groupBy(_._1._1).map { case (t, m) => t -> m.values.sum }
    val colM = cells.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    val chi2 = cells.map { case ((t, b), o) =>
      val e = rowM(t) * colM(b) / n; (o - e) * (o - e) / e
    }.sum
    val (r, c) = (rowM.size.toDouble, colM.size.toDouble)
    val phi2c = math.max(0.0, chi2 / n - (r - 1) * (c - 1) / (n - 1))
    val rc = r - (r - 1) * (r - 1) / (n - 1)
    val cc = c - (c - 1) * (c - 1) / (n - 1)
    val v = math.sqrt(phi2c / (math.min(rc, cc) - 1))
    val row = run("cramers_v_corrected").collect().head
    assert(row.getLong(0) == events.length.toLong)
    assert(row.getLong(1) == rowM.size.toLong && row.getLong(2) == colM.size.toLong)
    assert(math.abs(row.getDouble(3) - phi2c) <= 2e-4)
    assert(math.abs(row.getDouble(4) - v) <= 2e-4)
    assert(v >= 0.0 && v < 1.0)
    // the correction must actually engage: raw phi² is positive, so the
    // corrected value is strictly below it (possibly clamped to 0 — type
    // and k-decile are independent in the fixture, the textbook case the
    // bias correction exists for)
    assert(chi2 / n > 0.0 && phi2c < chi2 / n, "correction vacuous")
  }

  test("cat_iv: WoE and IV terms from the conditional counts") {
    val byType = events.groupBy(_._4)
    val g = byType.map { case (t, rs) => t -> rs.count(r => kOf(r._6) >= 50).toDouble }
    val b = byType.map { case (t, rs) => t -> rs.count(r => kOf(r._6) < 50).toDouble }
    val (gt, bt) = (g.values.sum, b.values.sum)
    val got = run("cat_iv").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == byType.keySet)
    byType.keys.foreach { t =>
      val woe = math.log((g(t) / gt) / (b(t) / bt))
      val iv = (g(t) / gt - b(t) / bt) * woe
      val (gg, gb, gwoe, giv) = got(t)
      assert(gg == g(t).toLong && gb == b(t).toLong, s"$t counts")
      assert(math.abs(gwoe - woe) <= 2e-4, s"$t woe")
      assert(math.abs(giv - iv) <= 2e-4, s"$t iv")
    }
    assert(got.values.exists(v => math.abs(v._3) > 1e-3),
      "all WoE ~ 0 — outcome split uninformative")
  }

  test("quantile_timing: fixed-bucket thresholds, zero floats") {
    def bucket(c: Long): Long =
      if (c < 1024) c
      else if (c < 32768) c / 16 * 16
      else if (c < 65536) c / 256 * 256
      else 65535L
    val got = run("quantile_timing").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    events.groupBy(_._4).foreach { case (et, rs) =>
      val bs = rs.map(r => bucket(cents(r._5))).sorted
      val n = bs.length
      def q(mulC: Long, mulN: Long): Long = {
        // smallest bucket whose cumulative count crosses the threshold
        var cum = 0L
        bs.distinct.map { bk =>
          cum += bs.count(_ == bk); (bk, cum)
        }.collectFirst { case (bk, c) if mulC * c >= mulN * n => bk }.get
      }
      val (gn, g50, g90, g99) = got(et)
      assert(gn == n.toLong, s"$et n")
      assert(g50 == q(2, 1), s"$et q50")
      assert(g90 == q(10, 9), s"$et q90")
      assert(g99 == q(100, 99), s"$et q99")
      // the 16-step coarse regime must actually engage (values > 10.24)
      assert(bs.exists(b => b >= 1024 && b % 16 == 0 && !rs.map(r => cents(r._5)).contains(b)) ||
        bs.exists(_ >= 1024), s"$et coarse regime never exercised")
    }
  }

  test("topk_if: conditional heavy hitters equal the filtered brute force") {
    val exp = events.filter(r => kOf(r._6) >= 50).groupBy(_._4)
      .map { case (t, rs) =>
        t -> rs.groupBy(_._1).toSeq
          .map { case (u, es) => (es.length, u.toString) }
          .sortBy { case (n, u) => (-n, u) }.take(10).map(_._2).mkString(",")
      }
    val got = run("topk_if").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == exp)
    // the predicate must prune: conditional top-10 differs from the
    // unconditional one for at least one type
    val uncond = events.groupBy(_._4).map { case (t, rs) =>
      t -> rs.groupBy(_._1).toSeq.map { case (u, es) => (es.length, u.toString) }
        .sortBy { case (n, u) => (-n, u) }.take(10).map(_._2).mkString(",")
    }
    assert(exp.exists { case (t, s) => s != uncond(t) },
      "filter never changed a ranking — -If combinator vacuous")
  }

  test("bigram_condprob: P(b|a) over re-derived pair counts") {
    val pairs = docTexts.flatMap { case (_, t) =>
      val ts = t.split(" ", -1); ts.dropRight(1).zip(ts.drop(1))
    }
    val cab = pairs.groupBy(identity).map { case (p, v) => p -> v.length.toLong }
    val ca = pairs.groupBy(_._1).map { case (a, v) => a -> v.length.toLong }
    val ctx = ca.filter(_._2 >= 100).toSeq
      .sortBy { case (a, c) => (-c, a) }.take(20).map(_._1).toSet
    val exp = cab.collect { case ((a, b), n) if ctx(a) => (a, b, n, ca(a)) }
      .groupBy(_._1).flatMap { case (_, rows) =>
        rows.toSeq.sortBy { case (_, b, n, _) => (-n, b) }.take(3)
      }.map { case (a, b, n, t) => (a, b, n, t, n.toDouble / t) }.toSet
    val got = run("bigram_condprob").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == exp)
    assert(exp.nonEmpty && exp.exists(_._5 < 1.0),
      "all conditional probabilities 1.0 — pair diversity vacuous")
  }

  test("unigram_surprisal: mean -ln p(tok) under the corpus unigram LM") {
    val toks = docTexts.flatMap { case (d, t) => t.split(" ", -1).map(d -> _) }
    val cnt = toks.groupBy(_._2).map { case (tok, v) => tok -> v.length.toLong }
    val tt = cnt.values.sum.toDouble
    val got = run("unigram_surprisal").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val inScope = toks.filter(_._1 < 100).groupBy(_._1)
    assert(got.keySet == inScope.keySet)
    inScope.foreach { case (d, ws) =>
      val s = ws.map { case (_, tok) => -math.log(cnt(tok) / tt) }.sum / ws.length
      val (gn, gs) = got(d)
      assert(gn == ws.length.toLong, s"doc=$d n_tok")
      assert(math.abs(gs - s) <= 2e-4, s"doc=$d got=$gs exp=$s")
    }
    // token frequencies must spread enough that per-doc surprisal varies,
    // else the signal degenerates to a constant
    assert(got.values.map(_._2).toSeq.distinct.length > 1,
      "uniform surprisal across docs — LM vacuous")
  }

  test("quantile_timing_reagg: per-day state cells re-merge to the one-pass result") {
    // the additive-state claim: folding per-(type, day) cells and summing
    // equals the direct one-pass aggregate, bit for bit
    val direct = run("quantile_timing").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val reagg = run("quantile_timing_reagg").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(reagg == direct)
    // the merge must be non-vacuous: >1 day of state cells per type
    assert(events.map(r => dayNum(r._2)).distinct.length > 1,
      "single-day fixture — state merge untested")
  }

  test("zipf_fit: log-log regression over the exact top-1000 token ranks") {
    val cnt = docTexts.flatMap(_._2.split(" ", -1))
      .groupBy(identity).map { case (t, v) => t -> v.length.toLong }
    val top = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(1000)
    val xs = top.indices.map(i => math.log((i + 1).toDouble))
    val ys = top.map { case (_, c) => math.log(c.toDouble) }
    val n = top.length.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val icept = (sy - slope * sx) / n
    val r = run("zipf_fit").collect().head
    assert(r.getLong(0) == top.length.toLong)
    assert(math.abs(r.getDouble(1) - slope) <= 2e-4, s"slope ${r.getDouble(1)} vs $slope")
    assert(math.abs(r.getDouble(2) - icept) <= 2e-4, s"intercept ${r.getDouble(2)} vs $icept")
    assert(slope < -0.1, "flat rank-frequency curve — fixture not Zipf-like")
  }

  test("js_divergence: plug-in JSD vs the corpus decile marginal") {
    val cells = events.groupBy(r => (r._4, kOf(r._6) / 10))
      .map { case (k, v) => k -> v.length.toLong }
    val nt = cells.groupBy(_._1._1).map { case (t, v) => t -> v.values.sum }
    val nb = cells.groupBy(_._1._2).map { case (b, v) => b -> v.values.sum }
    val tot = cells.values.sum.toDouble
    def log2(x: Double) = math.log(x) / math.log(2)
    val exp = cells.toSeq.groupBy(_._1._1).map { case (t, rows) =>
      t -> rows.map { case ((_, b), c) =>
        val p = c.toDouble / nt(t); val q = nb(b) / tot; val m = (p + q) / 2
        0.5 * p * log2(p / m) + 0.5 * q * log2(q / m)
      }.sum
    }
    val got = run("js_divergence").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, v) =>
      assert(math.abs(got(t) - v) <= 2e-4, s"$t got=${got(t)} exp=$v") }
    assert(exp.values.exists(_ > 1e-4),
      "all segments identical to the marginal — drift signal vacuous")
  }

  test("psi_drift: first/second-half decile shift terms") {
    val ds = events.map(r => (dayNum(r._2), kOf(r._6) / 10))
    val cut = (ds.map(_._1).min + ds.map(_._1).max + 1) / 2
    val np = ds.filter(_._1 < cut).groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
    val nq = ds.filter(_._1 >= cut).groupBy(_._2).map { case (b, v) => b -> v.length.toLong }
    val (tp, tq) = (np.values.sum.toDouble, nq.values.sum.toDouble)
    val got = run("psi_drift").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet == (np.keySet ++ nq.keySet))
    got.foreach { case (b, (gp, gq, term)) =>
      assert(gp == np.getOrElse(b, 0L) && gq == nq.getOrElse(b, 0L), s"decile $b counts")
      val p = gp / tp; val q = gq / tq
      assert(math.abs(term - (p - q) * math.log(p / q)) <= 2e-4, s"decile $b term")
    }
    assert(tp > 0 && tq > 0, "one half empty — PSI cut degenerate")
  }

  test("quantile_timing_if: conditional quantiles equal the filtered brute force") {
    def bucket(c: Long): Long =
      if (c < 1024) c
      else if (c < 32768) c / 16 * 16
      else if (c < 65536) c / 256 * 256
      else 65535L
    val got = run("quantile_timing_if").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    events.groupBy(_._4).foreach { case (et, rs) =>
      val sel = rs.filter(r => kOf(r._6) >= 50)
      val bs = sel.map(r => bucket(cents(r._5))).sorted
      val n = bs.length
      def q(mulC: Long, mulN: Long): Long = {
        var cum = 0L
        bs.distinct.map { bk => cum += bs.count(_ == bk); (bk, cum) }
          .collectFirst { case (bk, c) if mulC * c >= mulN * n => bk }.get
      }
      val (gn, g50, g90, g99) = got(et)
      assert(gn == n.toLong, s"$et n_if")
      assert(g50 == q(2, 1) && g90 == q(10, 9) && g99 == q(100, 99), s"$et")
      assert(n < rs.length, s"$et predicate never pruned — -If vacuous")
    }
  }

  test("linreg_fit_stats: R2/RMSE from the normal-equation identity") {
    val got = run("linreg_fit_stats").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    events.groupBy(_._4).foreach { case (et, rs) =>
      val n = rs.length.toDouble
      val ys = rs.map(r => cents(r._5)); val ks = rs.map(r => kOf(r._6))
      val ws = rs.map(r => dow(r._2))
      def s(xs: Seq[Long]) = xs.map(BigInt(_)).sum.toDouble
      def sp(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum.toDouble
      val (sk, sw, sy) = (s(ks), s(ws), s(ys))
      val (skk, sww, skw) = (sp(ks, ks), sp(ws, ws), sp(ks, ws))
      val (sky, swy, syy) = (sp(ks, ys), sp(ws, ys), sp(ys, ys))
      val det = n * (skk * sww - skw * skw) - sk * (sk * sww - skw * sw) +
        sw * (sk * skw - skk * sw)
      val b0 = (sy * (skk * sww - skw * skw) - sk * (sky * sww - skw * swy) +
        sw * (sky * skw - skk * swy)) / det
      val bK = (n * (sky * sww - skw * swy) - sy * (sk * sww - skw * sw) +
        sw * (sk * swy - sky * sw)) / det
      val bW = (n * (skk * swy - sky * skw) - sk * (sk * swy - sky * sw) +
        sy * (sk * skw - skk * sw)) / det
      val sse = syy - (b0 * sy + bK * sky + bW * swy)
      val (gn, gr2, grmse) = got(et)
      assert(gn == rs.length.toLong)
      assert(math.abs(gr2 - (1 - sse / (syy - sy * sy / n))) <= 2e-4, s"$et r2")
      assert(math.abs(grmse - math.sqrt(sse / n)) <= 2e-4, s"$et rmse")
      assert(gr2 >= -0.001 && gr2 <= 1.0, s"$et r2 out of range")
    }
  }

  test("benford_digits: first-digit histogram of the exact cents strings") {
    val cs = events.map(r => cents(r._5)).filter(_ > 0)
    val exp = cs.map(c => c.toString.head.asDigit.toLong)
      .groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    val tot = exp.values.sum.toDouble
    val got = run("benford_digits").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    assert(got.keySet.forall(d => d >= 1 && d <= 9))
    got.foreach { case (d, (n, pObs, pBen, chi)) =>
      assert(n == exp(d), s"digit $d count")
      assert(math.abs(pObs - n / tot) <= 2e-4, s"digit $d p_obs")
      val ben = math.log10(1 + 1.0 / d)
      assert(math.abs(pBen - ben) <= 2e-4, s"digit $d p_benford")
      assert(math.abs(chi - math.pow(n / tot - ben, 2) / ben) <= 2e-4, s"digit $d chi2")
    }
  }

  test("trimmed_mean: exact 10%-trim against the sorted brute force") {
    val got = run("trimmed_mean").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    events.groupBy(_._4).foreach { case (et, rs) =>
      val cs = rs.map(r => cents(r._5)).sorted
      val k = cs.length / 10
      val kept = cs.slice(k, cs.length - k)
      val exp = kept.map(BigInt(_)).sum.toDouble / kept.length
      val (gn, gKept, gMean) = got(et)
      assert(gn == cs.length.toLong && gKept == kept.length.toLong, s"$et counts")
      assert(math.abs(gMean - exp) <= 2e-4, s"$et got=$gMean exp=$exp")
      val plain = cs.map(BigInt(_)).sum.toDouble / cs.length
      assert(k > 0 && math.abs(exp - plain) > 1e-9,
        s"$et trim changed nothing — boundary handling untested")
    }
  }
}
