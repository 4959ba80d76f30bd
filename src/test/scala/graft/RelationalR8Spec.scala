package graft

/** Round-8 TPC-H-classic batch (#193-#195): independent Scala
  * re-derivations of the semantics at sf0.001.
  */
class RelationalR8Spec extends SparkSpecBase {

  private def orders =
    graft.sources.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))

  private def lineitem =
    graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_shipdate", "l_linestatus",
        "l_extendedprice", "l_discount").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3),
        r.getDouble(4), r.getDouble(5)))

  private def partRows =
    graft.sources.Tables(spark, sfDir, "part")
      .select("p_partkey", "p_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q4_priority_slowship equals the per-order EXISTS derivation") {
    val shipByOrder = lineitem.groupBy(_._1)
      .view.mapValues(_.map(l => dayNum(l._3)).toSeq).toMap
    val exp = orders
      .filter { case (ok, od, _) =>
        shipByOrder.getOrElse(ok, Seq.empty).exists(_ - dayNum(od) > 60)
      }
      .groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val got = run("q4_priority_slowship").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("q12_priority_class equals the joined conditional counts") {
    val hi = orders.map(o => o._1 -> Set("1-URGENT", "2-HIGH")(o._3)).toMap
    val exp = lineitem.groupBy(_._4).map { case (st, ls) =>
      val h = ls.count(l => hi(l._1)).toLong
      st -> ((h, ls.size - h))
    }
    val got = run("q12_priority_class").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == exp)
  }

  test("q14_promo_share equals the exact decimal revenue ratio") {
    def d2(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    val promo = partRows.map(p => p._1 -> (p._2 == "ECONOMY")).toMap
    val revs = lineitem.map(l => (promo(l._2), d2(l._5) * (1 - d2(l._6))))
    val tot = revs.map(_._2).sum
    val pr = revs.filter(_._1).map(_._2).sum
    val row = run("q14_promo_share").collect()(0)
    assert(row.getLong(1) == lineitem.length.toLong)
    assert(r4(row.getDouble(0)) == r4((100 * pr / tot).toDouble))
  }
}
