package graft

/** Independent Scala re-derivations for the r9 TPC-H-side additions
  * (#255-257) — brute-force folds over collected sf0.001 rows, sharing no
  * code with the operators under test.
  */
class TpchExtSpec extends SparkSpecBase {

  test("supplier_reliability_ci: Wilson bound re-derived by brute force") {
    val od = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "CAST(o_orderdate AS DATE)").collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    val lines = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey", "CAST(l_shipdate AS DATE)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val bySupp = lines.groupBy(_._2).map { case (sk, ls) =>
      val n = ls.length.toLong
      val late = ls.count(l => java.time.temporal.ChronoUnit.DAYS
        .between(od(l._1), l._3) > 60).toLong
      val p = late.toDouble / n
      val z2 = 1.96 * 1.96
      val w = (p + z2 / (2 * n) - 1.96 * math.sqrt(p * (1 - p) / n
        + z2 / (4.0 * n * n))) / (1 + z2 / n)
      (sk, n, late, p, w)
    }.toSeq
    val expected = bySupp.sortBy(s => (-s._5, s._1)).take(50)
    val got = run("supplier_reliability_ci").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"row $g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-3 && math.abs(g._5 - e._5) < 1e-3)
    }
    // the bound must be conservative: lb <= raw rate everywhere
    got.foreach(r => assert(r._5 <= r._4 + 1e-9))
  }

  test("segment_revenue_trend: shares re-derived by brute force") {
    val seg = spark.read.parquet(s"$sfDir/customer.parquet")
      .selectExpr("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val os = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_custkey", "year(o_orderdate)",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      .collect().map(r => (seg(r.getLong(0)), r.getInt(1).toLong,
        r.getLong(2)))
    val g = os.groupBy(o => (o._2, o._1)).map { case ((yr, sg), rows) =>
      (yr, sg) -> (rows.size.toLong, rows.map(_._3).sum)
    }
    val byYr = g.groupBy(_._1._1).map { case (yr, cells) =>
      yr -> cells.values.map(_._2).sum
    }
    val got = run("segment_revenue_trend").collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet == g.keySet)
    g.foreach { case ((yr, sg), (n, cents)) =>
      val (gn, grev, gshare) = got((yr, sg))
      assert(gn == n)
      assert(math.abs(grev - cents / 100.0) < 1e-6)
      assert(math.abs(gshare - cents.toDouble / byYr(yr)) < 1e-3)
    }
  }

  test("weighted_sample_es: keys and top-10 re-derived by brute force") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type", "event_id",
        "CAST(get_json_object(props, '$.k') AS BIGINT)").collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2)))
      .filter(_._3 > 0)
    def md5Long60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(d.take(15), 16)
    }
    val keyed = ev.map { case (t, id, w) =>
      val u = (md5Long60(id.toString) + 1).toDouble / 1152921504606846976.0
      (t, id, w, math.log(u) / w)
    }
    val expected = keyed.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      rows.sortBy(r => (-r._4, r._2)).take(10).zipWithIndex
        .map { case (r, i) => (t, i + 1L, r._2, r._3) }
    }.toSet
    val got = run("weighted_sample_es").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected,
      s"diff: ${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
  }
}
