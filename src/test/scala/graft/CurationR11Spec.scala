package graft

/** r11 additions beyond the verdict list — split/mix/leakage/heatmap — each
  * pinned against an independent Scala re-derivation at sf0.001 (the DuckDB
  * oracle is the driver gate's job; these pin the semantics).
  */
class CurationR11Spec extends SparkSpecBase {

  private lazy val docs =
    graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4)))

  /** The parity.md5Long spelling: first 15 md5 hex chars as a long. */
  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  test("train_test_split: 98/1/1 hash buckets, membership pinned by id sums") {
    val exp = docs.groupBy(d => (d._3, d._4)).map { case (k, ds) =>
      val bks = ds.map(d => (d._1, md5Long(s"split:${d._1}") % 100, d._5))
      val nTrain = bks.count(_._2 < 98).toLong
      k -> ((ds.length.toLong, nTrain,
        bks.count(_._2 == 98).toLong, bks.count(_._2 == 99).toLong,
        ds.map(_._5).sum,
        math.floor(nTrain.toDouble / ds.length * 10000 + 0.5) / 10000,
        bks.filter(_._2 == 98).map(_._1).sum,
        bks.filter(_._2 == 99).map(_._1).sum))
    }
    val got = run("train_test_split").collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7), r.getLong(8), r.getLong(9)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, v) => assert(got(k) == v, s"stratum $k") }
    // an existing doc's split never changes when the corpus grows: the
    // assignment depends only on doc_id, and the hash spelling itself is
    // pinned to a hard constant (md5("split:42")[0:15 hex] = 0x6ba1...,
    // bucket 28) so a drift in the md5Long spelling fails loudly
    assert(md5Long("split:42") == 484715419973882428L)
    assert(md5Long("split:42") % 100 == 28)
  }

  test("lang_mix: foreign-hit mass, integer flag spelling of ratio >= 0.25") {
    val lex = Map(
      "de" -> Set("der", "die", "das", "und", "ist"),
      "en" -> Set("the", "and", "of", "to", "in", "is", "a"),
      "es" -> Set("el", "los", "y", "es"),
      "fr" -> Set("le", "la", "les", "et", "est"))
    val exp = docs.map { d =>
      val ws = d._2.split(" ", -1).distinct.toSet
      val h = Seq("en", "de", "fr", "es").map(l => l -> (ws & lex(l)).size)
      val tot = h.map(_._2).sum
      val other = tot - h.map(_._2).max
      val pred =
        if (tot == 0) "und"
        else h.find { case (_, c) => c == h.map(_._2).max }.get._1
      d._1 -> ((pred, tot.toLong, other.toLong,
        if (tot > 0) math.floor(other.toDouble / tot * 10000 + 0.5) / 10000
        else 0.0,
        if (other >= 2 && 4 * other >= tot) 1L else 0L))
    }.toMap
    val got = run("lang_mix").collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (k, v) => assert(got(k) == v, s"doc $k") }
    // the flag must agree with the ratio it is the integer spelling of
    got.values.foreach { case (_, tot, other, ratio, flag) =>
      if (tot > 0)
        assert((flag == 1L) == (other >= 2 && other.toDouble / tot >= 0.25))
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
  }

  test("cross_source_leakage: pair provenance re-derived from simhash pairs") {
    val pairs = graft.dedup.Dedup.simhashPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = docs.map(d => d._1 -> d._4).toMap
    val cells = pairs
      .map { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        (Seq(sa, sb).min, Seq(sa, sb).max)
      }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val tot = cells.values.sum
    val got = run("cross_source_leakage").collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getDouble(4)))).toMap
    assert(got.keySet == cells.keySet)
    cells.foreach { case (k, n) =>
      val (gn, cross, share) = got(k)
      assert(gn == n, s"cell $k")
      assert(cross == (k._1 != k._2), s"cell $k cross flag")
      assert(share ==
        math.floor(n.toDouble / tot * 10000 + 0.5) / 10000, s"cell $k share")
    }
  }

  /** First 8 md5 hex chars as a long — the dedup-family h32. */
  private def h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }

  private def grams3(text: String): Seq[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < 3) Seq.empty
    else (0 to ws.length - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
  }

  test("minhash_reagg: merged cell signatures equal the brute-force signature") {
    val permA = graft.functions.MinHashAgg.defaultA
    val permB = graft.functions.MinHashAgg.defaultB
    val p = graft.functions.MinHashAgg.Prime
    val exp = docs.groupBy(_._3).map { case (lang, ds) =>
      val hs = ds.flatMap(d => grams3(d._2).distinct.map(h32)).distinct
      val sig = permA.indices.map(j =>
        hs.map(h => (permA(j) * h + permB(j)) % p).min)
      val md5 = {
        val dg = java.security.MessageDigest.getInstance("MD5")
          .digest(sig.mkString(",").getBytes("UTF-8"))
        dg.map("%02x".format(_)).mkString
      }
      lang -> ((hs.size.toLong, md5))
    }
    val got = run("minhash_reagg").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (lang, (n, md5)) =>
      val (gn, one, reagg) = got(lang)
      assert(gn == n, s"$lang shingle count")
      assert(one == md5, s"$lang one-pass signature")
      assert(reagg == md5, s"$lang re-merged signature")
    }
  }

  test("tok_coverage: top-k phrase mass with (freq desc, h asc) tie-break") {
    val counts = docs.toSeq.flatMap(d => grams3(d._2)).map(h32)
      .groupBy(identity).map { case (h, v) => (h, v.length.toLong) }
    val ranked = counts.toSeq.sortBy { case (h, n) => (-n, h) }.take(10000)
    val nTotal = counts.values.sum
    def cov(k: Int): Double = {
      val m = ranked.take(k).map(_._2).sum
      math.floor(m.toDouble / nTotal * 10000 + 0.5) / 10000
    }
    val r = run("tok_coverage").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == counts.size.toLong, "n_vocab")
    assert(row.getLong(1) == nTotal, "n_total")
    assert(row.getDouble(2) == cov(100), "cov_top100")
    assert(row.getDouble(3) == cov(1000), "cov_top1k")
    assert(row.getDouble(4) == cov(10000), "cov_top10k")
  }

  test("dow_hour_heatmap: margins and Pearson residuals on the 168-cell grid") {
    val events = graft.sources.Tables(spark, sfDir, "events")
      .select("ts").collect().map(_.getTimestamp(0))
    val cells = events.groupBy { ts =>
      val day = Math.floorDiv(ts.getTime, 86400000L)
      ((day + 4) % 7, Math.floorDiv(Math.floorMod(ts.getTime, 86400000L),
        3600000L))
    }.map { case (k, v) => k -> v.length.toLong }
    val rowT = cells.groupBy(_._1._1).map { case (d, m) => d -> m.values.sum }
    val colT = cells.groupBy(_._1._2).map { case (h, m) => h -> m.values.sum }
    val tot = cells.values.sum
    val got = run("dow_hour_heatmap").collect().map(r =>
      (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == cells.keySet)
    cells.foreach { case (k, n) =>
      val (gn, e, resid) = got(k)
      assert(gn == n, s"cell $k")
      val expE = rowT(k._1).toDouble * colT(k._2) / tot
      assert(math.abs(e - expE) <= 5e-5, s"cell $k expected")
      assert(math.abs(resid - (n - expE) / math.sqrt(expE)) <= 5e-5,
        s"cell $k residual")
    }
  }
}
