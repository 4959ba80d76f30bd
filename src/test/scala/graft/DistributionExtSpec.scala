package graft

/** Independent Scala re-derivations for the r9 distribution/quality
  * additions (#245-247) — brute-force folds over collected sf0.001 rows,
  * sharing no code with the operators under test.
  */
class DistributionExtSpec extends SparkSpecBase {

  private lazy val events: Seq[(String, Long, Long, Long)] =
    spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)",
        "CAST(get_json_object(props, '$.k') AS BIGINT)", "user_id")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3)))
      .toSeq

  test("quantile_interp_weighted: brackets re-derived by brute force") {
    val byType = events.filter(_._3 > 0).groupBy(_._1)
    val got = run("quantile_interp_weighted").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == byType.keySet)
    byType.foreach { case (t, rows) =>
      // expand the weighted multiset outright (tiny at sf0.001)
      val expanded = rows.flatMap(r => Seq.fill(r._3.toInt)(r._2))
        .sorted.toIndexedSeq
      val w = expanded.size.toLong
      def interp(num: Int, den: Int): Double = {
        val pos = (w - 1) * num
        val lo = expanded((pos / den).toInt)
        val hi = expanded((pos / den).toInt + 1)
        (lo + (pos % den).toDouble / den * (hi - lo)) / 100.0
      }
      assert(got(t)._1 == w, s"$t total weight")
      assert(math.abs(got(t)._2 - interp(1, 2)) < 1e-3, s"$t p50")
      assert(math.abs(got(t)._3 - interp(9, 10)) < 1e-3, s"$t p90")
    }
  }

  test("lorenz_points: decile shares re-derived by brute force") {
    val revs = events.filter(_._1 == "purchase").groupBy(_._4)
      .map { case (_, rows) => rows.map(_._2).sum }.toSeq.sorted
    val n = revs.size
    val tot = revs.map(BigInt(_)).sum
    val got = run("lorenz_points").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == (1L to 10L).toSet)
    (1 to 10).foreach { d =>
      val kd = n.toLong * d / 10
      val share = revs.take(kd.toInt).map(BigInt(_)).sum.toDouble /
        tot.toDouble
      assert(got(d.toLong)._1 == kd, s"decile $d cutoff")
      assert(math.abs(got(d.toLong)._2 - share) < 1e-5, s"decile $d share")
    }
    assert(math.abs(got(10L)._2 - 1.0) < 1e-9)
  }

  test("quality_logistic: scores re-derived by brute force") {
    val lex = Set("the", "and", "of", "to", "in", "is", "a")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = run("quality_logistic").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, text) =>
      val ws = text.split(" ", -1)
      val nw = ws.length.toDouble
      val z = -1.5 + 2.2 * (math.min(nw, 200.0) / 200.0) +
        1.8 * (ws.distinct.length / nw) +
        3.0 * (ws.count(lex) / nw) -
        0.1 * ((text.length - nw + 1) / nw)
      val score = 1.0 / (1.0 + math.exp(-z))
      assert(math.abs(got(id)._1 - score) < 1e-3, s"doc $id score")
      assert(got(id)._2 == (if (score >= 0.5) 1L else 0L), s"doc $id keep")
    }
  }
}
