package graft

/** Round-8 ninth batch (#189-#190): independent Scala re-derivations of
  * the semantics at sf0.001.
  */
class AnalyticsR8jSpec extends SparkSpecBase {

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("lang_confusion equals the re-derived declared×predicted crosstab") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val lex = graft.text.TextOps.lexicons.toMap
    def pred(text: String): String = {
      val ws = text.split(" ", -1).distinct.toSet
      val hEn = ws.intersect(lex("en").toSet).size
      val hDe = ws.intersect(lex("de").toSet).size
      val hFr = ws.intersect(lex("fr").toSet).size
      val hEs = ws.intersect(lex("es").toSet).size
      if (hEn == 0 && hDe == 0 && hFr == 0 && hEs == 0) "und"
      else if (hEn >= hDe && hEn >= hFr && hEn >= hEs) "en"
      else if (hDe >= hFr && hDe >= hEs) "de"
      else if (hFr >= hEs) "fr"
      else "es"
    }
    val cells = docs.map { case (lang, text) => (lang, pred(text)) }
    val exp = cells.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val margins = cells.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val got = run("lang_confusion").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.view.mapValues(_._1).toMap == exp)
    got.foreach { case ((lang, _), (n, share)) =>
      assert(r4(n.toDouble / margins(lang)) == r4(share))
    }
    assert(got.values.map(_._1).sum == docs.length.toLong,
      "crosstab must partition all docs")
  }

  test("week_over_week equals the weekly-total lag derivation") {
    val ev = graft.sources.Tables(spark, sfDir, "events")
      .select("ts", "event_type", "value").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2)))
    def dayNum(ts: java.sql.Timestamp): Long =
      java.time.Instant.ofEpochMilli(ts.getTime)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
    def cents(v: Double): Long =
      (BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact
    val weekly = ev.groupBy(e => (e._2, Math.floorDiv(dayNum(e._1), 7L)))
      .view.mapValues(_.map(e => cents(e._3)).sum).toMap
    val got = run("week_over_week").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_ => r.getDouble(3))))).toMap
    assert(got.view.mapValues(_._1).toMap == weekly)
    weekly.keys.groupBy(_._1).foreach { case (t, ks) =>
      val wks = ks.map(_._2).toSeq.sorted
      assert(got((t, wks.head))._2.isEmpty, s"$t: first week must be NULL")
      wks.sliding(2).foreach {
        case Seq(p, w) =>
          val exp = r4((weekly((t, w)) - weekly((t, p))).toDouble / weekly((t, p)))
          assert(got((t, w))._2.map(r4).contains(exp), s"($t,$w)")
        case _ => ()
      }
    }
  }
}
