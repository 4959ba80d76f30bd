package graft

/** Round-8 closing relational batch (#198-#199): independent Scala
  * re-derivations of the semantics at sf0.001.
  */
class RelationalR8bSpec extends SparkSpecBase {

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  test("delivery_lag_quantiles equals nearest-rank over joined lag days") {
    val prio = graft.sources.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority").collect()
      .map(r => r.getLong(0) -> ((dayNum(r.getTimestamp(1)), r.getString(2))))
      .toMap
    val lags = graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_shipdate").collect()
      .map { r =>
        val (od, pri) = prio(r.getLong(0))
        (pri, dayNum(r.getTimestamp(1)) - od)
      }
    val got = run("delivery_lag_quantiles").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    lags.groupBy(_._1).foreach { case (pri, ls) =>
      val xs = ls.map(_._2).sorted
      def sel(q: Double) = xs(math.ceil(q * xs.size).toInt - 1)
      assert(got(pri) == ((xs.size.toLong, sel(0.50), sel(0.90))), s"$pri")
    }
  }

  test("brand_band_revenue equals the exact decimal banded rollup") {
    def d2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val brand = graft.sources.Tables(spark, sfDir, "part")
      .select("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      .collect()
      .map { r =>
        val band = if (r.getDouble(1) <= 10) "a_low"
          else if (r.getDouble(1) <= 25) "b_mid" else "c_high"
        ((brand(r.getLong(0)), band), d2(r.getDouble(2)) * (1 - d2(r.getDouble(3))))
      }
    val exp = rows.groupBy(_._1).map { case (k, rs) =>
      k -> ((rs.length.toLong, rs.map(_._2).sum))
    }
    val got = run("brand_band_revenue").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.view.mapValues(_._1).toMap == exp.view.mapValues(_._1).toMap)
    exp.foreach { case (k, (_, rev)) =>
      assert(math.abs(got(k)._2 - rev.toDouble) < 1e-6, s"$k")
    }
  }
}
