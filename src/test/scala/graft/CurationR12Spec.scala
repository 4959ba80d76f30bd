package graft

/** #301-#303 r12 additions (minhash calibration, word entropy, dup-quality
  * bias): each pinned against an independent Scala re-derivation at
  * sf0.001 (the DuckDB oracle is the driver gate's job; these pin the
  * semantics).
  */
class CurationR12Spec extends SparkSpecBase {

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs =
    graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("word_entropy: H = ln n - (sum c ln c)/n per doc, doc_id < 100") {
    val exp = docs.filter(_._1 < 100).map { case (id, text, _) =>
      val ws = text.split(" ", -1)
      val counts = ws.groupBy(identity).map(_._2.length)
      val n = ws.length
      val sl = counts.map(c => c * math.log(c.toDouble)).sum
      val h = math.log(n.toDouble) - sl / n
      val norm = if (counts.size > 1)
        Some(r4(h / math.log(counts.size.toDouble))) else None
      id -> ((n.toLong, counts.size.toLong, r4(h), norm))
    }.toMap
    val got = run("word_entropy").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (id, (n, ty, h, norm)) =>
      assert(got(id)._1 == n && got(id)._2 == ty, s"counts $id")
      assert(math.abs(got(id)._3 - h) < 2e-4, s"H $id")
      (got(id)._4, norm) match {
        case (Some(a), Some(b)) => assert(math.abs(a - b) < 2e-4, s"norm $id")
        case (a, b) => assert(a == b, s"norm presence $id")
      }
    }
    assert(got.size == 100)
  }

  test("dup_quality_bias: norm-key dup flag vs #37 quality, pb corr") {
    def normKey(text: String): String =
      text.toLowerCase.split(" ", -1).distinct.sorted.mkString(" ")
    val fams = docs.groupBy(d => normKey(d._2)).map { case (k, ds) =>
      k -> ds.length }
    val rows = docs.map { case (_, text, lang) =>
      val ws = text.split(" ", -1)
      val q = math.min(ws.length.toDouble, 100.0) / 100.0 *
        (0.5 + 0.5 * (ws.distinct.length.toDouble / ws.length))
      (lang, if (fams(normKey(text)) > 1) 1 else 0, q)
    }
    val exp = rows.groupBy(_._1).map { case (lang, rs) =>
      val n = rs.length; val nd = rs.count(_._2 == 1)
      val sq1 = rs.filter(_._2 == 1).map(_._3).sum
      val sq0 = rs.filter(_._2 == 0).map(_._3).sum
      val sq = rs.map(_._3).sum; val sqq = rs.map(x => x._3 * x._3).sum
      val varQ = sqq / n - (sq / n) * (sq / n)
      val p = nd.toDouble / n
      val rpb = if (nd > 0 && nd < n && varQ > 0)
        Some(r4((sq1 / nd - sq0 / (n - nd)) / math.sqrt(varQ) *
          math.sqrt(p * (1 - p))))
      else None
      lang -> ((nd.toLong, (n - nd).toLong,
        if (nd > 0) Some(r4(sq1 / nd)) else None,
        if (nd < n) Some(r4(sq0 / (n - nd))) else None, rpb))
    }
    val got = run("dup_quality_bias").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(got.keySet == exp.keySet)
    def close(a: Option[Double], b: Option[Double], what: String): Unit =
      (a, b) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 2e-4, what)
        case (x, y) => assert(x == y, s"$what presence")
      }
    exp.foreach { case (lang, (nd, nu, q1, q0, rpb)) =>
      assert(got(lang)._1 == nd && got(lang)._2 == nu, s"counts $lang")
      close(got(lang)._3, q1, s"q_dup $lang")
      close(got(lang)._4, q0, s"q_uniq $lang")
      close(got(lang)._5, rpb, s"r_pb $lang")
    }
    // the fixture seeds exact-dup families: at least one lang has dups
    assert(exp.values.exists(_._1 > 0))
  }

  test("minhash_est_error: banded candidates, k/16 vs exact J per decile") {
    import graft.functions.MinHashAgg.{NumPerms, Prime, defaultA, defaultB}
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val shingled = docs.flatMap { case (id, text, _) =>
      val ws = text.split(" ", -1)
      if (ws.length < 3) None
      else Some(id -> ws.sliding(3).map(_.mkString(" ")).toSet.map(h32))
    }.toMap
    val sigs = shingled.map { case (id, hs) =>
      id -> (0 until NumPerms).map(j =>
        hs.map(h => (defaultA(j) * h + defaultB(j)) % Prime).min).toVector
    }
    // band-bucket candidates (4 bands x 4 rows; the 512 cap is inert at
    // this SF - largest bucket is far below it)
    val cand = (0 until 4).flatMap { b =>
      sigs.toSeq.groupBy(_._2.slice(b * 4, b * 4 + 4)).values
        .flatMap { grp =>
          val ids = grp.map(_._1).sorted
          for (i <- ids.indices; j <- (i + 1) until ids.size)
            yield (ids(i), ids(j))
        }
    }.distinct
    assert(cand.nonEmpty, "fixture must surface LSH candidate pairs")
    val scored = cand.map { case (a, b) =>
      val k = (0 until NumPerms).count(j => sigs(a)(j) == sigs(b)(j))
      val nInt = (shingled(a) & shingled(b)).size
      val nUni = shingled(a).size + shingled(b).size - nInt
      val bucket = math.min(9L, math.floor((nInt * 10).toDouble / nUni).toLong)
      (bucket, k.toDouble / NumPerms, nInt.toDouble / nUni)
    }
    val exp = scored.groupBy(_._1).map { case (bk, ps) =>
      bk -> ((ps.size.toLong, r4(ps.map(_._2).sum / ps.size),
        r4(ps.map(_._3).sum / ps.size),
        r4(ps.map(p => math.abs(p._2 - p._3)).sum / ps.size)))
    }
    val got = run("minhash_est_error").collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (bk, (n, me, mt, mae)) =>
      assert(got(bk)._1 == n, s"n_pairs bucket $bk")
      assert(math.abs(got(bk)._2 - me) < 2e-4, s"mean_est $bk")
      assert(math.abs(got(bk)._3 - mt) < 2e-4, s"mean_true $bk")
      assert(math.abs(got(bk)._4 - mae) < 2e-4, s"mean_abs_err $bk")
    }
  }
}
