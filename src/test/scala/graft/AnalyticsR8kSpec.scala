package graft

/** Round-8 tenth batch (#191-#192): independent Scala re-derivations of
  * the semantics at sf0.001.
  */
class AnalyticsR8kSpec extends SparkSpecBase {

  private def events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("user_id", "ts", "event_id", "event_type", "props").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3),
        r.getString(4)))

  private def kOf(props: String): Option[Long] =
    "\"k\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(props).map(_.group(1).toLong)

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("first_touch_conversion equals the per-user first-event derivation") {
    def us(ts: java.sql.Timestamp): Long =
      ts.getTime * 1000 + (ts.getNanos / 1000) % 1000
    val byUser = events.groupBy(_._1).toSeq.map { case (_, es) =>
      val first = es.minBy(e => (us(e._2), e._3))._4
      val conv = if (es.exists(_._4 == "purchase")) 1L else 0L
      (first, conv)
    }
    val exp = byUser.groupBy(_._1).map { case (t, us_) =>
      val conv = us_.map(_._2).sum
      t -> ((us_.size.toLong, conv, r4(conv.toDouble / us_.size)))
    }
    val got = run("first_touch_conversion").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == exp)
    assert(got.values.map(_._1).sum == events.map(_._1).distinct.length.toLong,
      "attribution must partition all users")
  }

  test("conversion_by_decile equals the direct conditional counts") {
    val cells = events.flatMap(e => kOf(e._5).map(k => (k / 10, e._4)))
    val exp = cells.groupBy(_._1).map { case (b, es) =>
      val np = es.count(_._2 == "purchase").toLong
      b -> ((es.size.toLong, np, r4(np.toDouble / es.size)))
    }
    val got = run("conversion_by_decile").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got == exp)
  }
}
