package graft

/** Round-8 eighth batch (#187-#188): independent Scala re-derivations of
  * the semantics at sf0.001.
  */
class AnalyticsR8iSpec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("ts", "value", "props").collect()
      .map(r => (r.getTimestamp(0), r.getDouble(1), r.getString(2)))

  private def docsRows =
    graft.sources.Tables(spark, sfDir, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))

  private def hourOf(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).getHour.toLong

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  private def kOf(props: String): Option[Long] =
    "\"k\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(props).map(_.group(1).toLong)

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rank_corr_matrix equals Pearson on average tie-ranks") {
    val rows = events.flatMap(e =>
      kOf(e._3).map(k => (cents(e._2), k, hourOf(e._1))))
    def avgRanks(xs: Seq[Long]): Map[Long, Double] = {
      val sorted = xs.sorted.zipWithIndex.map { case (v, i) => (v, i + 1.0) }
      sorted.groupBy(_._1).view
        .mapValues(g => g.map(_._2).sum / g.size).toMap
    }
    val feats = Map("v" -> rows.map(_._1), "k" -> rows.map(_._2),
      "h" -> rows.map(_._3))
    val got = run("rank_corr_matrix").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_ => r.getDouble(2))))).toMap
    for (pair <- Seq("k_h", "v_h", "v_k")) {
      val Array(a, b) = pair.split("_")
      val ra = avgRanks(feats(a)); val rb = avgRanks(feats(b))
      val xs = feats(a).map(ra); val ys = feats(b).map(rb)
      val n = xs.size.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val (sxx, syy) = (xs.map(x => x * x).sum, ys.map(y => y * y).sum)
      val (vx, vy) = (n * sxx - sx * sx, n * syy - sy * sy)
      val (gn, grho) = got(pair)
      assert(gn == rows.length.toLong)
      if (vx > 0 && vy > 0) {
        val rho = (n * sxy - sx * sy) / math.sqrt(vx * vy)
        assert(math.abs(grho.get - rho) < 1e-3, s"$pair: got $grho want $rho")
        assert(grho.get >= -1.0 - 1e-9 && grho.get <= 1.0 + 1e-9)
      }
    }
  }

  test("dup_rate_by_source equals the exact distinct-text derivation") {
    val exp = docsRows.groupBy(_._1).map { case (src, ds) =>
      val uniq = ds.map(_._2).distinct.size.toLong
      src -> ((ds.size.toLong, uniq, r4(1.0 - uniq.toDouble / ds.size)))
    }
    val got = run("dup_rate_by_source").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == exp)
    got.values.foreach { case (n, u, rate) =>
      assert(u <= n && rate >= 0.0 && rate < 1.0)
    }
  }
}
