package graft

import org.apache.spark.sql.functions._

class TextSpec extends SparkSpecBase {

  test("quality metrics are bounded ratios") {
    val rows = run("text_quality").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0001, "distinct_ratio")
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1.0001, "stop_ratio")
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1.0001, "quality")
    }
  }

  test("fingerprint is order-sensitive (reversed words → different fp)") {
    import spark.implicits._
    val two = Seq("a b c", "c b a").toDF("text")
    val fp = aggregate(split(col("text"), " "), lit(""),
      (acc, w) => md5(concat(acc, lit(":"), w)))
    val fps = two.select(fp).as[String].collect()
    assert(fps(0) != fps(1))
  }

  test("token counts: ws == re on punctuation-free text, bpe >= ws") {
    val rows = run("text_tokens").collect()
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
    assert(rows.forall(r => r.getLong(3) >= r.getLong(1)))
  }

  test("langid always predicts a lexicon language or 'und', hits consistent") {
    val rows = run("text_langid").collect()
    val langs = Set("en", "de", "fr", "es", "und")
    assert(rows.forall(r => langs(r.getString(1))))
    assert(rows.forall(r => (r.getString(1) == "und") == (r.getLong(2) == 0L)))
  }

  test("doc_repetition equals a direct distinct-gram recompute") {
    val got = run("doc_repetition").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val exp = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map { r =>
        val ws = r.getString(1).toLowerCase.split(" ", -1).toSeq
        val n = ws.size
        val grams = ws.zip(ws.tail)
        val g = if (n > 1) (grams.size - grams.distinct.size).toDouble / grams.size else 0.0
        r.getLong(0) -> ((g, (n - ws.distinct.size).toDouble / n))
      }.toMap
    assert(got == exp)
    assert(got.values.exists(_._1 > 0), "no doc has any duplicate 2-gram — vacuous")
    assert(got.values.forall { case (a, b) => a >= 0 && a <= 1 && b >= 0 && b <= 1 })
  }

  test("winnow_fingerprint equals a direct sliding-window recompute") {
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def h32(x: String): Long = java.lang.Long.parseLong(md5hex(x).take(8), 16)
    val exp = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect().flatMap { r =>
        val ws = r.getString(1).split(" ", -1)
        if (ws.length < 3) None else {
          val hs = (0 to ws.length - 3).map(i => h32(s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}"))
          val keys = hs.zipWithIndex.map { case (h, i) => h * 1048576L + (1048575L - i) }
          val sel = keys.sliding(4).filter(_.size == 4).map(_.min)
            .map(k => (1048575L - k % 1048576L, k / 1048576L)).toSet
          if (sel.isEmpty) None
          else Some(r.getLong(0) ->
            ((hs.size.toLong, sel.size.toLong, sel.toSeq.map(_._2).sum % 1000003L)))
        }
      }.toMap
    val got = run("winnow_fingerprint").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got == exp)
    // density must sit in winnowing's theoretical band: every selected
    // position covers at most W windows, at least one per window
    run("winnow_fingerprint").collect().foreach { r =>
      val d = r.getDouble(3)
      assert(d > 0.0 && d <= 1.0, s"doc ${r.getLong(0)} density $d")
    }
  }

  test("gopher_rules flags equal a direct per-doc recompute; battery non-vacuous") {
    val stop = Set("the", "and", "of", "to", "in", "is", "a")
    val got = run("gopher_rules").collect().map { r =>
      r.getLong(0) -> ((r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9),
        r.getLong(10), r.getLong(11)))
    }.toMap
    val exp = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect().map { r =>
        val text = r.getString(1)
        val ws = text.split(" ", -1).toSeq
        val nw = ws.size
        val nsp = text.length - nw + 1
        val nAlpha = text.count(c => c >= 'a' && c <= 'z')
        val nDigit = text.count(c => c >= '0' && c <= '9')
        val mwl = nsp.toDouble / nw
        val rWc = nw >= 50 && nw <= 100000
        val rMwl = mwl >= 3.0 && mwl <= 10.0
        val rSym = (nsp - nAlpha - nDigit).toDouble / nsp <= 0.1
        val rAlpha = nAlpha.toDouble / nsp >= 0.8
        val rStop = ws.count(stop) >= 2
        def f(b: Boolean) = if (b) 1L else 0L
        r.getLong(0) -> ((f(rWc), f(rMwl), f(rSym), f(rAlpha), f(rStop),
          f(rWc && rMwl && rSym && rAlpha && rStop)))
      }.toMap
    assert(got == exp)
    val kept = got.values.map(_._6)
    assert(kept.exists(_ == 1L) && kept.exists(_ == 0L),
      "kept verdict never varies — rule battery vacuous on this corpus")
  }
}
