package graft

/** The r6 statistical-surface additions (#110-#113): Welch's t, Mann-Whitney
  * U, skewness/kurtosis and M4 downsampling — each pinned against an
  * independent Scala re-derivation at sf0.001 (bit-equality where the
  * operator promises it: every formula is one IEEE chain on exact moments).
  */
class StatTestsSpec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type", "value", "props")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getDouble(4), r.getString(5)))

  private def cents(v: Double): BigDecimal =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  private def kOf(props: String): Long = {
    val m = """"k"\s*:\s*"?(\d+)""".r.findFirstMatchIn(props)
    m.get.group(1).toLong
  }

  test("welch_ttest: t and Welch-Satterthwaite df from exact moments, bit-equal") {
    val xs = events.filter(_._4 == "click").map(r => cents(r._5))
    val ys = events.filter(_._4 == "view").map(r => cents(r._5))
    val nx = xs.length.toLong; val ny = ys.length.toLong
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val sxx = xs.map(x => x * x).sum.toDouble
    val syy = ys.map(y => y * y).sum.toDouble
    val ux = ((sxx - sx * sx / nx) / (nx - 1)) / nx
    val uy = ((syy - sy * sy / ny) / (ny - 1)) / ny
    val t = (sx / nx - sy / ny) / math.sqrt(ux + uy)
    val df = (ux + uy) * (ux + uy) /
      (ux * ux / (nx - 1) + uy * uy / (ny - 1))

    val row = run("welch_ttest").collect().head
    assert(row.getLong(0) == nx && row.getLong(1) == ny)
    assert(row.getDouble(2) == t, "t_stat")
    assert(row.getDouble(3) == df, "df")
  }

  test("mannwhitney_utest equals the per-row average-rank definition") {
    val pool = events.filter(r => r._4 == "click" || r._4 == "view")
      .map(r => (cents(r._5), r._4 == "click"))
    // classic definition: sort the pooled sample, average ranks over ties
    val sorted = pool.sortBy(_._1)
    val rankOf = sorted.zipWithIndex.groupBy(_._1._1).map { case (v, g) =>
      v -> (g.map(_._2 + 1).sum.toDouble / g.length) // mean of 1-based ranks
    }
    val nx = pool.count(_._2).toLong
    val n = pool.length.toLong
    val ny = n - nx
    val r1 = pool.filter(_._2).map(p => rankOf(p._1)).sum
    val t3 = pool.groupBy(_._1).values
      .map(g => g.length.toLong).map(c => c * c * c - c).sum
    val u1 = r1 - nx * (nx + 1) / 2.0
    val z = (u1 - nx * ny / 2.0) /
      math.sqrt(nx * ny / 12.0 * ((n + 1) - t3.toDouble / (n * (n - 1))))

    val row = run("mannwhitney_utest").collect().head
    assert(row.getLong(0) == nx && row.getLong(1) == ny)
    // R1 is a half-integer sum < 2^53: exact regardless of summation order
    assert(row.getDouble(2) == u1, "u_stat")
    assert(row.getDouble(3) == z, "z_score")
    assert(t3 > 0, "no ties at this SF — tie-correction untested, vacuous")
  }

  test("skew_kurt matches exact-power-sum central moments per event_type") {
    val got = run("skew_kurt").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    val byType = events.groupBy(_._4)
    assert(got.keySet == byType.keySet)
    byType.foreach { case (et, rs) =>
      val ks = rs.map(r => kOf(r._6))
      val n = rs.length.toLong
      val s1 = ks.sum.toDouble
      val s2 = ks.map(k => k * k).sum.toDouble
      val s3 = ks.map(k => k * k * k).sum.toDouble
      val s4 = ks.map(k => k * k * k * k).sum.toDouble
      val mean = s1 / n
      val m2 = s2 / n - mean * mean
      val m3 = s3 / n - 3 * mean * (s2 / n) + 2 * mean * mean * mean
      val m4 = s4 / n - 4 * mean * (s3 / n) + 6 * (mean * mean) * (s2 / n) -
        3 * ((mean * mean) * (mean * mean))
      val (gn, gMean, gSkew, gKurt) = got(et)
      assert(gn == n)
      assert(gMean == mean, s"$et mean")
      assert(gSkew == m3 / (m2 * math.sqrt(m2)), s"$et skewness")
      assert(gKurt == m4 / (m2 * m2) - 3, s"$et kurtosis")
    }
  }

  test("cramers_v: chi-square association over the (type, k-decile) grain") {
    val cells = events.map(r => (r._4, kOf(r._6) / 10))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val n = events.length.toLong
    val rm = cells.groupBy(_._1._1).map { case (t, g) => t -> g.values.sum }
    val cm = cells.groupBy(_._1._2).map { case (b, g) => b -> g.values.sum }
    val chi2 = cells.map { case ((t, b), c) =>
      val e = rm(t).toDouble * cm(b) / n
      (c - e) * (c - e) / e
    }.sum
    val v = math.sqrt(chi2 / (n * (math.min(rm.size, cm.size) - 1)))

    val row = run("cramers_v").collect().head
    assert(row.getLong(0) == n)
    assert(row.getLong(1) == rm.size.toLong && row.getLong(2) == cm.size.toLong)
    // the cell fold is the one float-order-dependent step; the op rounds to
    // 4 dp, so compare within the clamp (entropy_agg discipline)
    assert(math.abs(row.getDouble(3) - chi2) < 2e-4, s"chi2 ${row.getDouble(3)} vs $chi2")
    assert(math.abs(row.getDouble(4) - v) < 2e-4, s"V ${row.getDouble(4)} vs $v")
    assert(row.getDouble(4) >= 0.0 && row.getDouble(4) <= 1.0)
  }

  test("student_ttest: pooled-variance t from exact moments, bit-equal") {
    val xs = events.filter(_._4 == "click").map(r => cents(r._5))
    val ys = events.filter(_._4 == "view").map(r => cents(r._5))
    val nx = xs.length.toLong; val ny = ys.length.toLong
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val sxx = xs.map(x => x * x).sum.toDouble
    val syy = ys.map(y => y * y).sum.toDouble
    val ss = (sxx - sx * sx / nx) + (syy - sy * sy / ny)
    val t = (sx / nx - sy / ny) /
      math.sqrt(ss / (nx + ny - 2) * (1.0 / nx + 1.0 / ny))

    val row = run("student_ttest").collect().head
    assert(row.getLong(0) == nx && row.getLong(1) == ny)
    assert(row.getDouble(2) == t, "t_stat")
    assert(row.getLong(3) == nx + ny - 2, "df")
  }

  test("ks_test: sup CDF gap via exact cross-multiplied integers, bit-equal") {
    val xs = events.filter(_._4 == "click").map(r => cents(r._5))
    val ys = events.filter(_._4 == "view").map(r => cents(r._5))
    val nx = xs.length.toLong; val ny = ys.length.toLong
    val dnum = (xs ++ ys).distinct.map { v =>
      val cx = xs.count(_ <= v).toLong
      val cy = ys.count(_ <= v).toLong
      math.abs(cx * ny - cy * nx)
    }.max
    val d = dnum.toDouble / (nx.toDouble * ny)

    val row = run("ks_test").collect().head
    assert(row.getLong(0) == nx && row.getLong(1) == ny)
    assert(row.getDouble(2) == d, "d_stat")
    assert(row.getDouble(3) == d * math.sqrt(nx.toDouble * ny / (nx + ny)), "ks_z")
    assert(dnum > 0, "identical CDFs at this SF — sup selection vacuous")
  }

  test("spearman_corr equals Pearson over classic average ranks") {
    val rows = events.map(r => (cents(r._5), kOf(r._6)))
    def avgRanks[T: Ordering](xs: Seq[T]): Map[T, Double] =
      xs.sorted.zipWithIndex.groupBy(_._1).map { case (v, g) =>
        v -> g.map(_._2 + 1).sum.toDouble / g.length // mean of 1-based ranks
      }
    val rv = avgRanks(rows.map(_._1).toSeq)
    val rk = avgRanks(rows.map(_._2).toSeq)
    val pairs = rows.map(r => (rv(r._1), rk(r._2)))
    val n = pairs.length.toDouble
    val mx = pairs.map(_._1).sum / n; val my = pairs.map(_._2).sum / n
    val cov = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
    val vx = pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val vy = pairs.map(p => (p._2 - my) * (p._2 - my)).sum
    val rho = cov / math.sqrt(vx * vy)

    val row = run("spearman_corr").collect().head
    assert(row.getLong(0) == rows.length.toLong)
    // independent derivation sums in a different order — compare to 1e-9;
    // cross-ENGINE bit-equality is what the driver oracle pins
    assert(math.abs(row.getDouble(1) - rho) < 1e-9,
      s"rho ${row.getDouble(1)} vs $rho")
    assert(rk.values.exists(r => r != math.floor(r)),
      "no tied ranks at this SF — the average-rank path is vacuous")
  }

  test("theils_u: mutual information over entropies, within the 4-dp clamp") {
    val cells = events.map(r => (r._4, kOf(r._6) / 10))
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val n = events.length.toDouble
    def h(counts: Iterable[Long]): Double =
      counts.map { c => val p = c / n; -p * math.log(p) / math.log(2) }.sum
    val ht = h(cells.groupBy(_._1._1).values.map(_.values.sum))
    val hb = h(cells.groupBy(_._1._2).values.map(_.values.sum))
    val htb = h(cells.values)
    val mi = ht + hb - htb

    val row = run("theils_u").collect().head
    assert(row.getLong(0) == events.length.toLong)
    assert(math.abs(row.getDouble(1) - mi / ht) < 2e-4,
      s"U(t|b) ${row.getDouble(1)} vs ${mi / ht}")
    assert(math.abs(row.getDouble(2) - mi / hb) < 2e-4,
      s"U(b|t) ${row.getDouble(2)} vs ${mi / hb}")
    assert(row.getDouble(1) > 0 && row.getDouble(1) <= 1.0)
    assert(row.getDouble(2) > 0 && row.getDouble(2) <= 1.0)
  }

  test("ts_downsample_m4: min/max/first/last per (type, day) with event_id tie-break") {
    val got = run("ts_downsample_m4").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6)))).toMap
    val byBucket = events.groupBy(r =>
      (r._4, java.time.Instant.ofEpochMilli(r._2.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString))
    assert(got.keySet == byBucket.keySet)
    var multi = 0
    byBucket.foreach { case (key, rs) =>
      val inOrder = rs.sortBy(r => (r._2.getTime, r._3))
      val vs = rs.map(r => cents(r._5))
      val (n, vMin, vMax, vFirst, vLast) = got(key)
      assert(n == rs.length.toLong, s"$key n")
      assert(vMin == vs.min.toDouble && vMax == vs.max.toDouble, s"$key extremes")
      assert(vFirst == cents(inOrder.head._5).toDouble, s"$key first")
      assert(vLast == cents(inOrder.last._5).toDouble, s"$key last")
      if (rs.length > 3) multi += 1
    }
    assert(multi > 0, "every bucket trivial (<4 rows) — M4 selection vacuous")
  }
}
