package graft

/** Round-9 curation batch (#214-#216) + CH-surface batch (#217-#220):
  * independent re-derivations at sf0.001.
  */
class CurationSpec extends SparkSpecBase {

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs =
    graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  private lazy val events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("event_id", "ts", "user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))

  private def cents(v: Double): Long =
    (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLong

  test("dedup_cluster_rep picks the longest doc per cluster, ties to min id") {
    val clusters = run("dedup_clusters").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val nchars = docs.map(d => d._1 -> d._5).toMap
    val exp = clusters.groupBy(_._2).map { case (cid, ms) =>
      val rep = ms.map(_._1).minBy(id => (-nchars(id), id))
      cid -> ((rep, ms.size.toLong, nchars(rep)))
    }
    val got = run("dedup_cluster_rep").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == exp)
    // a representative is at least as long as every member of its cluster
    clusters.foreach { case (id, cid) =>
      assert(exp(cid)._3 >= nchars(id))
    }
  }

  test("mixture_weights equalizes token mass (weight x tokens = target)") {
    val bySrc = docs.groupBy(_._4).view.mapValues { ds =>
      (ds.size.toLong, ds.map(_._2.split(" ").length.toLong).sum)
    }.toMap
    val tt = bySrc.values.map(_._2).sum
    val target = tt.toDouble / bySrc.size
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = run("mixture_weights").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == bySrc.keySet)
    got.foreach { case (src, (nd, nt, share, w)) =>
      assert((nd, nt) == bySrc(src))
      assert(share == r6(nt.toDouble / tt))
      assert(w == r6(target / nt))
      // sampling at rate ∝ weight equalizes token mass by construction
      assert(math.abs(w * nt - target) < 1e-4 * target)
    }
  }

  test("surprisal_filter: tercile score cutoffs bucket every doc") {
    val toks = docs.flatMap(_._2.split(" "))
    val cnt = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tt = toks.length.toDouble
    val score = docs.map { d =>
      val ws = d._2.split(" ")
      val s = ws.map(w => -math.log(cnt(w) / tt)).sum / ws.length
      (d._1, d._3, r4(s))
    }
    val bucketed: Seq[(String, String, Double)] =
      score.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
        val sorted = ds.map(_._3).sorted.toSeq
        val n = sorted.length
        // smallest score cell whose cumulative count clears k/3 of n
        def cutoff(k: Int): Double =
          sorted.zipWithIndex.collectFirst {
            case (sc, i) if 3 * (i + 1) >= k * n => sc
          }.get
        val (t1, t2) = (cutoff(1), cutoff(2))
        ds.map { d =>
          val b = if (d._3 <= t1) "head"
            else if (d._3 <= t2) "middle" else "tail"
          (lang, b, d._3)
        }.toSeq
      }
    val exp = bucketed.groupBy(x => (x._1, x._2)).map { case (k, vs) =>
      val scores = vs.map(v => BigDecimal(v._3))
      k -> ((vs.size.toLong, r4((scores.sum / vs.size).toDouble)))
    }
    val got = run("surprisal_filter").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got == exp)
    // cutoffs really split score mass: every head mean < middle < tail,
    // and each bucket holds at least a quarter of its language's docs
    // (ties can only fatten a bucket past n/3, never starve it below the
    // cutoff mass at these SFs' near-distinct scores)
    got.keys.groupBy(_._1).foreach { case (lang, ks) =>
      val m = ks.map(k => k._2 -> got(k)).toMap
      assert(m("head")._2 < m("middle")._2 && m("middle")._2 < m("tail")._2)
      val n = m.values.map(_._1).sum
      m.values.foreach { case (c, _) => assert(4 * c >= n - 3, lang) }
    }
  }

  test("funnel_strict_order: contiguous-chain levels over tracked events") {
    val tracked = Map("signup" -> "s", "click" -> "c", "purchase" -> "p")
    val exp = events.filter(e => tracked.contains(e._4))
      .groupBy(_._3).map { case (_, es) =>
        val str = es.sortBy(e => (e._2.getTime, e._1))
          .map(e => tracked(e._4)).mkString
        if (str.contains("scp")) 3L
        else if (str.contains("sc")) 2L
        else if (str.contains("s")) 1L
        else 0L
      }.groupBy(identity).map { case (l, us) => l -> us.size.toLong }
    val got = run("funnel_strict_order").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
  }

  test("quantile_exact_bounds matches nearest-index selection on sorted data") {
    val byType = events.groupBy(_._4)
    val got = run("quantile_exact_bounds").collect()
      .map(r => r.getString(0) -> r).toMap
    byType.foreach { case (t, es) =>
      val sorted = es.map(e => cents(e._5)).sorted
      val n = sorted.length
      def low(k: Int) = sorted(((n - 1).toLong * k / 4).toInt)
      def high(k: Int) = sorted((((n - 1).toLong * k + 3) / 4).toInt)
      val r = got(t)
      assert(r.getLong(1) == n.toLong)
      assert((r.getLong(2), r.getLong(3)) == ((low(1), high(1))))
      assert((r.getLong(4), r.getLong(5)) == ((low(2), high(2))))
      assert((r.getLong(6), r.getLong(7)) == ((low(3), high(3))))
    }
  }

  test("group_array_sorted returns the 8 smallest cents per type, in order") {
    val exp = events.groupBy(_._4).map { case (t, es) =>
      t -> es.map(e => (cents(e._5), e._1)).sorted.take(8)
        .map(_._1).mkString(",")
    }
    val got = run("group_array_sorted").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == exp)
  }

  test("sparkbar renders exact (c*7)//max glyph levels in day order") {
    val glyphs = "▁▂▃▄▅▆▇█".toCharArray.map(_.toString)
    def day(ts: java.sql.Timestamp) =
      java.time.Instant.ofEpochMilli(ts.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
    val exp = events.groupBy(_._4).map { case (t, es) =>
      val daily = es.groupBy(e => day(e._2)).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val mx = daily.map(_._2).max
      t -> ((daily.size.toLong, mx,
        daily.map { case (_, c) => glyphs((c * 7 / mx).toInt) }.mkString))
    }
    val got = run("sparkbar").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == exp)
  }

  test("retention_conditions equals the per-user bool fold") {
    val byUser = events.groupBy(_._3)
    val flags = byUser.values.map { es =>
      (es.exists(_._4 == "signup"),
        es.exists(e => e._4 == "click" && e._5 > 95),
        es.exists(e => e._4 == "purchase" && e._5 > 99))
    }.toSeq
    val r1 = flags.count(_._1).toLong
    val r2 = flags.count(f => f._1 && f._2).toLong
    val r3 = flags.count(f => f._1 && f._3).toLong
    val row = run("retention_conditions").collect().head
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((byUser.size.toLong, r1, r2, r3)))
    assert(row.getDouble(4) == r4(r2.toDouble / r1))
    assert(row.getDouble(5) == r4(r3.toDouble / r1))
  }

  test("funnel_strict_dedup: repeat-of-matched-step interrupts the chain") {
    val tracked = Map("signup" -> "s", "click" -> "c", "purchase" -> "p")
    val exp = events.filter(e => tracked.contains(e._4))
      .groupBy(_._3).map { case (_, es) =>
        val str = es.sortBy(e => (e._2.getTime, e._1))
          .map(e => tracked(e._4)).mkString
        if ("s[^s]*c[^sc]*p".r.findFirstIn(str).isDefined) 3L
        else if ("s[^s]*c".r.findFirstIn(str).isDefined) 2L
        else if (str.contains("s")) 1L
        else 0L
      }.groupBy(identity).map { case (l, us) => l -> us.size.toLong }
    val got = run("funnel_strict_dedup").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp)
    // strict_order (contiguity) is strictly harder than strict_dedup
    // (no-repeat-of-matched): every strict_order level-3 user is a
    // strict_dedup level-3 user, and both modes see the same user set
    val strictOrder = run("funnel_strict_order").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(strictOrder.getOrElse(3L, 0L) <= got.getOrElse(3L, 0L))
    assert(strictOrder.values.sum == got.values.sum)
  }

  test("quantile_deterministic: hash-selected sample, exact at small n") {
    // at sf0.001 every type has < 8192 events → the sample IS the full
    // set and med_c equals the exact nearest-rank median
    val got = run("quantile_deterministic").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    events.groupBy(_._4).foreach { case (t, es) =>
      val cs = es.map(e => cents(e._5)).sorted
      val n = cs.length
      val med = cs(math.max(0, (n + 1) / 2 - 1))
      val (nTotal, nSample, medC) = got(t)
      assert(nTotal == n.toLong && nSample == n.toLong, t)
      assert(medC == med, t)
    }
  }

  test("winsorized_mean equals the clamp-at-decile fold") {
    val got = run("winsorized_mean").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    events.groupBy(_._4).foreach { case (t, es) =>
      val cs = es.map(e => cents(e._5)).sorted
      val n = cs.length
      def rank(k: Int, of: Int) = // min value with 10·cum >= k·n over grain
        cs(cs.indices.find(i => 10 * (i + 1) >= k * n).get)
      val lo = rank(1, 10); val hi = rank(9, 10)
      val tot = cs.map(c => math.min(math.max(c, lo), hi)).sum
      val (gn, glo, ghi, gmean) = got(t)
      assert(gn == n.toLong && glo == lo && ghi == hi, t)
      assert(gmean == r4(tot.toDouble / n / 100), t)
    }
  }

  test("ts_downsample_lttb equals an independent integer LTTB") {
    def day(ts: java.sql.Timestamp) =
      java.time.Instant.ofEpochMilli(ts.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
    val exp = events.groupBy(_._4).flatMap { case (t, es) =>
      val series = es.groupBy(e => day(e._2)).view
        .mapValues(_.map(e => BigInt(cents(e._5))).sum.toLong)
        .toSeq.sortBy(_._1)
      val n = series.length
      val sel = if (n <= 10) series.indices
      else {
        val nb = 8; val nMid = n - 2
        val picks = scala.collection.mutable.ArrayBuffer(0)
        for (k <- 0 until nb) {
          val lo = 1 + (k.toLong * nMid / nb).toInt
          val hi = 1 + ((k + 1).toLong * nMid / nb).toInt - 1
          val (sx, sy, cnt) = if (k + 1 < nb) {
            val nlo = 1 + ((k + 1).toLong * nMid / nb).toInt
            val nhi = 1 + ((k + 2).toLong * nMid / nb).toInt - 1
            val pts = (nlo to nhi).map(series)
            (pts.map(_._1).sum, pts.map(_._2).sum, pts.size.toLong)
          } else (series(n - 1)._1, series(n - 1)._2, 1L)
          val (xa, ya) = series(picks.last)
          val best = (lo to hi).maxBy { b =>
            val (xb, yb) = series(b)
            val area = (BigInt(cnt) * xa * yb - BigInt(xa) * sy +
              BigInt(xb) * sy - BigInt(cnt) * xb * ya +
              BigInt(sx) * ya - BigInt(sx) * yb).abs
            (area, BigInt(-b)) // earliest wins ties
          }
          picks += best
        }
        picks += (n - 1)
        picks.toSeq
      }
      sel.map(i => (t, series(i)._1, series(i)._2))
    }.toSet
    val got = run("ts_downsample_lttb").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp)
    // endpoints always survive downsampling
    events.groupBy(_._4).foreach { case (t, es) =>
      val days = es.map(e => day(e._2))
      assert(got.exists(p => p._1 == t && p._2 == days.min), t)
      assert(got.exists(p => p._1 == t && p._2 == days.max), t)
    }
  }

  test("semdedup keeps exactly one representative per cosine component") {
    val pairs = run("dedup_embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // union-find with min roots
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val dropped = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .filter(n => find(n) != n).toSet
    val vecs = graft.sources.Tables(spark, sfDir, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val exp = vecs.groupBy(_._2).map { case (lab, vs) =>
      val ids = vs.map(_._1)
      val nd = ids.count(dropped)
      lab -> ((ids.size.toLong, ids.size.toLong - nd, nd.toLong,
        ids.sum - ids.filter(dropped).sum))
    }
    val got = run("semdedup").collect()
      .map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    assert(got == exp)
  }

  test("interval_overlap_count: complement counting equals the pair join") {
    // two INDEPENDENT plans for the same number: #72 enumerates pairs
    // through the bucket join, #233 never builds a pair
    val viaJoin = run("interval_overlap").collect().head.getLong(0)
    val viaSweep = run("interval_overlap_count").collect().head.getLong(0)
    assert(viaSweep == viaJoin)
    // and the brute-force derivation agrees with both
    def day(ts: java.sql.Timestamp) =
      java.time.Instant.ofEpochMilli(ts.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
    val iv = events.groupBy(_._3).view
      .mapValues(es => (es.map(e => day(e._2)).min, es.map(e => day(e._2)).max))
      .toMap.values.toSeq
    val exp = (for {
      i <- iv.indices; j <- (i + 1) until iv.size
      if iv(i)._1 <= iv(j)._2 && iv(j)._1 <= iv(i)._2
    } yield 1).size.toLong
    assert(viaSweep == exp)
  }

  // full µs precision — getTime alone truncates to millis and could
  // misorder events sharing a millisecond
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  test("seq_match_events returns each user's leftmost chain") {
    val tracked = Set("signup", "click", "purchase")
    val exp = events.filter(e => tracked(e._4)).groupBy(_._3)
      .flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (micros(e._2), e._1))
        val ord = Ordering.Tuple2[Long, Long]
        def firstAfter(t: String, after: Option[(Long, Long)]) =
          sorted.find(e => e._4 == t && after.forall(a =>
            ord.gt((micros(e._2), e._1), a))).map(e => (micros(e._2), e._1))
        for {
          s <- firstAfter("signup", None)
          c <- firstAfter("click", Some(s))
          p <- firstAfter("purchase", Some(c))
        } yield u -> ((s._2, c._2, p._2))
      }
    val got = run("seq_match_events").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == exp.toMap)
  }

  test("group_array_last returns the 8 most recent cents, oldest first") {
    val exp = events.groupBy(_._4).map { case (t, es) =>
      t -> es.sortBy(e => (-micros(e._2), -e._1)).take(8).reverse
        .map(e => cents(e._5)).mkString(",")
    }
    val got = run("group_array_last").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == exp)
  }

  test("exp_time_decayed_avg equals the closed-form weighted mean") {
    val exp = events.groupBy(_._3).map { case (u, es) =>
      val days = es.map(e => java.time.Instant.ofEpochMilli(e._2.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay)
      val last = days.max
      val w = days.map(d => math.pow(0.5, (last - d).toDouble))
      val xs = es.map(_._5).zip(w).map { case (x, wi) => x * wi }
      u -> ((r4(xs.sum / w.sum), es.size.toLong))
    }
    val got = run("exp_time_decayed_avg").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(got.keySet == exp.keySet)
    // the weighted mean itself is order-sensitive in the last bits; compare
    // to 1e-9 (the op's 4-dp rounding sits far inside that window)
    got.foreach { case (u, (avg, n)) =>
      assert(n == exp(u)._2)
      assert(math.abs(avg - exp(u)._1) < 1e-9, s"user $u")
    }
  }
}
