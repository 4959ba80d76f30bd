package graft

/** Round-9 TPC-H deep batch (#203-#213): independent Scala re-derivations
  * of each query's semantics from collected sf0.001 rows — no Spark ops in
  * the expectation path, so a planner/expression bug cannot cancel out.
  */
class TpchDeepSpec extends SparkSpecBase {

  private def d2(v: Double) =
    BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  private def dayNum(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay

  private def yearOf(ts: java.sql.Timestamp): Long =
    java.time.Instant.ofEpochMilli(ts.getTime)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate.getYear.toLong

  private lazy val lineitem =
    graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getString(6), r.getTimestamp(7)))

  private lazy val orders =
    graft.sources.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3),
        r.getTimestamp(4)))

  private lazy val customer =
    graft.sources.Tables(spark, sfDir, "customer")
      .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))

  private lazy val supplier =
    graft.sources.Tables(spark, sfDir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getDouble(3)))

  private lazy val partRows =
    graft.sources.Tables(spark, sfDir, "part")
      .select("p_partkey", "p_brand", "p_size")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))

  private lazy val nations =
    graft.sources.Tables(spark, sfDir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2)))

  private lazy val regions =
    graft.sources.Tables(spark, sfDir, "region")
      .select("r_regionkey", "r_name")
      .collect().map(r => (r.getInt(0), r.getString(1)))

  private def rev(l: (Long, Long, Long, Double, Double, Double, String,
      java.sql.Timestamp)): BigDecimal = d2(l._5) * (1 - d2(l._6))

  test("q7_volume_shipping equals the pair-filtered join derivation") {
    val nname = nations.map(n => n._1 -> n._2).toMap
    val pair = Set("NATION_1", "NATION_2")
    val sn = supplier.collect {
      case (sk, _, nk, _) if pair(nname(nk)) => sk -> nname(nk)
    }.toMap
    val cn = customer.collect {
      case (ck, _, nk, _) if pair(nname(nk)) => ck -> nname(nk)
    }.toMap
    val orderCust = orders.map(o => o._1 -> o._2).toMap
    val exp = lineitem.flatMap { l =>
      for {
        s <- sn.get(l._3)
        c <- orderCust.get(l._1).flatMap(cn.get)
        if s != c
      } yield ((s, c, yearOf(l._8)), rev(l))
    }.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._2).sum.toDouble))
    }
    val got = run("q7_volume_shipping").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(3), r.getDouble(4)))).toMap
    assert(got == exp)
  }

  test("q10_returned_items equals the returned-revenue top-20") {
    val orderCust = orders.map(o => o._1 -> o._2).toMap
    val revByCust = lineitem.filter(_._7 == "R")
      .groupBy(l => orderCust(l._1))
      .view.mapValues(_.map(rev).sum).toMap
    val top = revByCust.toSeq.sortBy { case (ck, r) => (-r, ck) }.take(20)
    val custMap = customer.map(c => c._1 -> c).toMap
    val nname = nations.map(n => n._1 -> n._2).toMap
    val exp = top.map { case (ck, r) =>
      val c = custMap(ck)
      (ck, c._2, nname(c._3), c._4, r.toDouble)
    }.toSet
    val got = run("q10_returned_items").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == exp)
  }

  test("q15_top_supplier equals the max-revenue derivation") {
    val lo = java.time.LocalDate.parse("1996-01-01").toEpochDay
    val hi = java.time.LocalDate.parse("1996-04-01").toEpochDay
    val bySupp = lineitem
      .filter(l => dayNum(l._8) >= lo && dayNum(l._8) < hi)
      .groupBy(_._3).view.mapValues(_.map(rev).sum).toMap
    val mx = bySupp.values.max
    val names = supplier.map(s => s._1 -> s._2).toMap
    val exp = bySupp.collect { case (sk, r) if r == mx =>
      (sk, names(sk), r.toDouble)
    }.toSet
    val got = run("q15_top_supplier").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == exp)
  }

  test("q19_disjunctive_pred equals the bracket-OR derivation") {
    val pmap = partRows.map(p => p._1 -> ((p._2, p._3))).toMap
    val sel = lineitem.filter { l =>
      val (brand, size) = pmap(l._2)
      val q = l._4
      (brand == "Brand#1" && q >= 1 && q <= 11 && size >= 1 && size <= 5) ||
      (brand == "Brand#2" && q >= 10 && q <= 20 && size >= 1 && size <= 10) ||
      (brand == "Brand#3" && q >= 20 && q <= 30 && size >= 1 && size <= 15)
    }
    val row = run("q19_disjunctive_pred").collect().head
    assert(row.getLong(0) == sel.size.toLong)
    assert(row.getDouble(1) == sel.map(rev).sum.toDouble)
  }

  test("q16_supplier_cnt equals the anti-joined distinct derivation") {
    val complaints = supplier.filter(_._4 < 0).map(_._1).toSet
    val pmap = partRows.map(p => p._1 -> ((p._2, p._3))).toMap
    val exp = lineitem
      .filter(l => !complaints(l._3))
      .map(l => (pmap(l._2), l._3))
      .filter { case ((brand, _), _) => brand != "Brand#1" }
      .distinct
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
      .map { case ((b, sz), n) => (b, sz.toLong) -> n }
    val got = run("q16_supplier_cnt").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == exp)
  }

  test("q18_large_orders equals the quantity-HAVING derivation") {
    val sumQty = lineitem.groupBy(_._1)
      .view.mapValues(_.map(l => d2(l._4)).sum).toMap
    val custMap = customer.map(c => c._1 -> c._2).toMap
    val exp = orders
      .filter(o => sumQty.getOrElse(o._1, BigDecimal(0)) > 250)
      .sortBy(o => (-o._4, o._1)).take(100)
      .map(o => (o._2, custMap(o._2), o._1, o._4, sumQty(o._1).toDouble))
      .toSet
    val got = run("q18_large_orders").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got == exp)
  }

  test("q21_waiting_supplier equals the only-late-supplier derivation") {
    val fOrders = orders.filter(_._3 == "F")
      .map(o => o._1 -> dayNum(o._5)).toMap
    val l2 = lineitem.flatMap { l =>
      fOrders.get(l._1).map(od =>
        (l._1, l._3, dayNum(l._8) - od > 90))
    }
    val byOrder = l2.groupBy(_._1)
    val waits = for {
      (ok, ls) <- byOrder.toSeq
      nSupp = ls.map(_._2).distinct.size
      late = ls.filter(_._3).map(_._2).distinct
      if nSupp > 1 && late.size == 1
    } yield (late.head, ok)
    val names = supplier.map(s => s._1 -> s._2).toMap
    val exp = waits.distinct.groupBy(w => names(w._1))
      .view.mapValues(_.size.toLong).toSeq
      .sortBy { case (n, c) => (-c, n) }.take(25).toSet
    val got = run("q21_waiting_supplier").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exp)
  }

  test("q22_idle_customers equals the recency anti-join derivation") {
    val pos = customer.filter(_._4 > 0)
    val avgBal = pos.map(c => d2(c._4)).sum.toDouble / pos.size
    val cut = java.time.LocalDate.parse("1999-01-01").toEpochDay
    val recent = orders.filter(o => dayNum(o._5) >= cut).map(_._2).toSet
    val nname = nations.map(n => n._1 -> n._2).toMap
    val idle = customer.filter(c => c._4 > avgBal && !recent(c._1))
    val exp = idle.groupBy(c => nname(c._3)).map { case (n, cs) =>
      n -> ((cs.size.toLong, cs.map(c => d2(c._4)).sum.toDouble))
    }
    val got = run("q22_idle_customers").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == exp)
  }

  test("q2_min_price_supplier equals the min-unit-cost derivation") {
    val unitCost = lineitem.groupBy(l => (l._2, l._3))
      .view.mapValues { ls =>
        ls.map(l => d2(l._5)).sum.toDouble / ls.map(l => d2(l._4)).sum.toDouble
      }.toMap
    val winner = unitCost.groupBy(_._1._1).map { case (pk, m) =>
      val (k, c) = m.minBy { case ((_, sk), c) => (c, sk) }
      pk -> ((k._2, c))
    }
    val pmap = partRows.filter(_._3 <= 10).map(p => p._1 -> p._2).toMap
    val sname = supplier.map(s => s._1 -> s._2).toMap
    val exp = winner.collect { case (pk, (sk, c)) if pmap.contains(pk) =>
      (pk, pmap(pk), sk, sname(sk), c) // raw IEEE ratio, no rounding (§5)
    }.toSet
    val got = run("q2_min_price_supplier").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSet
    assert(got == exp)
  }

  test("q11_important_parts equals the top-50 value-share derivation") {
    val byPart = lineitem.groupBy(_._2)
      .view.mapValues(_.map(l => d2(l._5)).sum).toMap
    val total = byPart.values.sum.toDouble
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = byPart.toSeq.sortBy { case (pk, v) => (-v, pk) }.take(50)
      .map { case (pk, v) => (pk, v.toDouble, r6(v.toDouble / total)) }.toSet
    val got = run("q11_important_parts").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got == exp)
  }

  test("q6_forecast_revenue equals the filtered decimal sum") {
    val lo = java.time.LocalDate.parse("1996-01-01").toEpochDay
    val hi = java.time.LocalDate.parse("1997-01-01").toEpochDay
    val sel = lineitem.filter { l =>
      val d = dayNum(l._8)
      d >= lo && d < hi && d2(l._6) >= BigDecimal("0.05") &&
        d2(l._6) <= BigDecimal("0.07") && l._4 < 24
    }
    val row = run("q6_forecast_revenue").collect().head
    assert(row.getLong(0) == sel.size.toLong)
    assert(row.getDouble(1) == sel.map(l => d2(l._5) * d2(l._6)).sum.toDouble)
  }

  test("q17_small_qty_revenue equals the correlated-average derivation") {
    val byPart = lineitem.groupBy(_._2).view.mapValues { ls =>
      (ls.map(l => d2(l._4)).sum, ls.size)
    }.toMap
    val econParts = graft.sources.Tables(spark, sfDir, "part")
      .select("p_partkey", "p_type").collect()
      .collect { case r if r.getString(1) == "ECONOMY" => r.getLong(0) }.toSet
    val sel = lineitem.filter { l =>
      val (sq, cnt) = byPart(l._2)
      econParts(l._2) && d2(l._4) * 5 * cnt < sq
    }
    val row = run("q17_small_qty_revenue").collect().head
    assert(row.getLong(0) == sel.size.toLong)
    assert(row.getDouble(1) == sel.map(l => d2(l._5)).sum.toDouble)
  }

  test("q20_surplus_suppliers equals the semi-chain derivation") {
    val econParts = graft.sources.Tables(spark, sfDir, "part")
      .select("p_partkey", "p_type").collect()
      .collect { case r if r.getString(1) == "ECONOMY" => r.getLong(0) }.toSet
    val qual = lineitem
      .filter(l => econParts(l._2) && yearOf(l._8) == 1997L)
      .groupBy(l => (l._3, l._2))
      .collect { case ((sk, _), ls)
        if ls.map(l => d2(l._4)).sum > 50 => sk }.toSet
    val names = supplier.map(s => s._1 -> s._2).toMap
    val exp = qual.map(sk => (sk, names(sk)))
    val got = run("q20_surplus_suppliers").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == exp)
  }

  test("q13_customer_distribution counts zero-order customers") {
    val prio = graft.sources.Tables(spark, sfDir, "orders")
      .select("o_custkey", "o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val counts = prio.filter(_._2 != "1-URGENT")
      .groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val exp = customer.map(c => counts.getOrElse(c._1, 0L))
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val got = run("q13_customer_distribution").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("q9_product_profit equals the dim-chain profit derivation") {
    val blue = graft.sources.Tables(spark, sfDir, "part")
      .select("p_partkey", "p_name", "p_retailprice").collect()
      .collect { case r if r.getString(1).contains("blue") =>
        r.getLong(0) -> BigDecimal(0.6 * r.getDouble(2))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP)
      }.toMap
    val nname = nations.map(n => n._1 -> n._2).toMap
    val snat = supplier.map(s => s._1 -> nname(s._3)).toMap
    val oyear = orders.map(o => o._1 -> yearOf(o._5)).toMap
    val exp = lineitem.flatMap { l =>
      blue.get(l._2).map { cost =>
        ((snat(l._3), oyear(l._1)),
          rev(l) - cost * d2(l._4))
      }
    }.groupBy(_._1).map { case (k, vs) =>
      k -> ((vs.size.toLong, vs.map(_._2).sum.toDouble))
    }
    val got = run("q9_product_profit").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == exp)
  }

  test("q8_market_share equals the conditional-ratio derivation") {
    val nmap = nations.map(n => n._1 -> ((n._2, n._3))).toMap
    val asia = regions.collect { case (rk, "ASIA") => rk }.toSet
    val asiaCust = customer.filter(c => asia(nmap(c._3)._2)).map(_._1).toSet
    val target = supplier.filter(s => nmap(s._3)._1 == "NATION_2")
      .map(_._1).toSet
    val suppSet = supplier.map(_._1).toSet
    val ordMap = orders.collect {
      case o if asiaCust(o._2) => o._1 -> yearOf(o._5)
    }.toMap
    val js = lineitem.flatMap { l =>
      ordMap.get(l._1).filter(_ => suppSet(l._3))
        .map(y => (y, rev(l), target(l._3)))
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val exp = js.groupBy(_._1).map { case (y, vs) =>
      val tot = vs.map(_._2).sum.toDouble
      val tgt = vs.filter(_._3).map(_._2).sum
      // a year with no target-nation lines is NULL in both engines; the
      // derivation mirrors it as -1 and the reader maps NULL to -1 too
      val share = if (vs.exists(_._3)) r4(tgt.toDouble / tot) else -1.0
      y -> ((vs.size.toLong, share))
    }
    val got = run("q8_market_share").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))).toMap
    assert(got == exp)
  }
}
