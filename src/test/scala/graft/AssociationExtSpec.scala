package graft

/** Independent Scala re-derivations for the r9 association/series
  * additions (#240-242) — brute-force folds over collected sf0.001 rows,
  * sharing no code with the operators under test.
  */
class AssociationExtSpec extends SparkSpecBase {

  private lazy val lineBrand: Seq[(Long, Long, String, Long)] = {
    val brands = spark.read.parquet(s"$sfDir/part.parquet")
      .selectExpr("p_partkey", "p_brand").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey", "l_partkey",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
          "(1 - CAST(l_discount AS DECIMAL(18,2))) * 100 AS BIGINT)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), brands(r.getLong(2)),
        r.getLong(3)))
      .toSeq
  }

  test("hhi_concentration: shares re-derived by brute force") {
    val bySupp = lineBrand.groupBy(r => (r._3, r._2))
      .map { case ((b, sk), rows) => (b, sk, rows.map(_._4).sum) }
    val expected = bySupp.groupBy(_._1).map { case (b, ss) =>
      val tot = ss.map(_._3).map(BigInt(_)).sum
      val ssq = ss.map(s => BigInt(s._3) * BigInt(s._3)).sum
      b -> (ss.size.toLong,
        ssq.toDouble / (tot.toDouble * tot.toDouble))
    }
    val got = run("hhi_concentration").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (b, (n, hhi)) =>
      assert(got(b)._1 == n, s"$b n_suppliers")
      assert(math.abs(got(b)._2 - hhi) < 1e-5, s"$b hhi")
    }
  }

  test("basket_lift: pair lifts re-derived by brute force") {
    val grain = lineBrand.map(r => (r._1, r._3)).distinct
    val nOrders = grain.map(_._1).distinct.size.toLong
    val marg = grain.groupBy(_._2).map { case (b, g) => b -> g.size.toLong }
    val pairs = grain.groupBy(_._1).values.flatMap { rows =>
      val bs = rows.map(_._2).sorted
      for (i <- bs.indices; j <- i + 1 until bs.size) yield (bs(i), bs(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val got = run("basket_lift").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keySet == pairs.keySet)
    pairs.foreach { case ((a, b), nab) =>
      assert(got((a, b))._1 == nab, s"($a,$b) n_ab")
      val lift = nOrders.toDouble * nab / (marg(a) * marg(b))
      assert(math.abs(got((a, b))._2 - lift) < 1e-3, s"($a,$b) lift")
    }
  }

  test("path3_topk: top 3-step paths re-derived by brute force") {
    val evs = graft.sources.Tables(spark, sfDir, "events")
      .selectExpr("user_id", "event_id", "event_type", "unix_micros(ts)")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val paths = evs.groupBy(_._1).values.flatMap { rows =>
      val ts = rows.sortBy(r => (r._4, r._2)).map(_._3).toSeq
      ts.sliding(3).filter(_.size == 3).map(_.mkString(">"))
    }.toSeq
    val counts = paths.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val total = counts.values.sum
    val expected = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = run("path3_topk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(g => (g._1, g._2)).toSeq == expected, s"got=${got.toSeq}")
    got.foreach { case (p, n, share) =>
      assert(math.abs(share - n.toDouble / total) < 1e-6, s"$p share") }
  }

  test("cusum_changepoint: argmax re-derived by brute force") {
    val days = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("event_type",
        "datediff(CAST(ts AS DATE), DATE '1970-01-01')")
      .collect().map(r => (r.getString(0), r.getInt(1).toLong)).toSeq
    val expected = days.groupBy(_._1).map { case (t, rows) =>
      val series = rows.groupBy(_._2).map { case (d, g) =>
        (d, g.size.toLong)
      }.toSeq.sortBy(_._1)
      val n = series.size.toLong
      val s = series.map(_._2).sum
      var pre = 0L
      val cs = series.zipWithIndex.map { case ((d, x), i) =>
        pre += x
        (d, n * pre - (i + 1) * s)
      }
      val best = cs.minBy { case (d, c) => (-math.abs(c), d) }
      t -> (java.time.LocalDate.ofEpochDay(best._1).toString,
        best._2, n)
    }
    val got = run("cusum_changepoint").collect()
      .map(r => r.getString(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == expected)
  }

  test("open_orders_daily: backlog sweep re-derived by brute force") {
    val od = spark.read.parquet(s"$sfDir/orders.parquet")
      .selectExpr("o_orderkey", "datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val hi = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_orderkey", "datediff(CAST(l_shipdate AS DATE), DATE '1970-01-01')")
      .collect().groupBy(_.getLong(0))
      .map { case (k, rs) => k -> rs.map(_.getInt(1)).max }
    val deltas = scala.collection.mutable.Map[Int, Long]()
    hi.foreach { case (ok, h) =>
      val lo = od(ok)
      deltas(lo) = deltas.getOrElse(lo, 0L) + 1
      deltas(h + 1) = deltas.getOrElse(h + 1, 0L) - 1
    }
    var open = 0L
    val expected = deltas.toSeq.sortBy(_._1).map { case (d, dx) =>
      open += dx
      java.time.LocalDate.ofEpochDay(d.toLong).toString -> open
    }.toMap
    val got = run("open_orders_daily").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // backlog returns to zero after the last ship date
    assert(expected(expected.keys.max) == 0L)
  }
}
