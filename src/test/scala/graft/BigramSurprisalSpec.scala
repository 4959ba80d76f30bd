package graft

/** #283 `bigram_surprisal` — pinned against an independent Scala
  * re-derivation at sf0.001 (the DuckDB oracle is the driver gate's job;
  * this pins the semantics: corpus bigram LM, p(b|a) = c(a,b)/c(a,·),
  * per-doc mean −ln p over consecutive word pairs).
  */
class BigramSurprisalSpec extends SparkSpecBase {

  test("per-doc mean -ln p(b|a) matches a hand fold at sf0.001") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val pairsAll = docs.flatMap { case (_, t) =>
      val ws = t.split(" ", -1); ws.dropRight(1).zip(ws.drop(1))
    }
    val cab = pairsAll.groupBy(identity).view.mapValues(_.length.toDouble).toMap
    val ca = pairsAll.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val exp = docs.filter(_._1 < 100).flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      val ps = ws.dropRight(1).zip(ws.drop(1))
      if (ps.isEmpty) None
      else {
        val nll = ps.map(p => -math.log(cab(p) / ca(p._1))).sum / ps.length
        Some(id -> ((ps.length.toLong,
          math.floor(nll * 10000 + 0.5) / 10000)))
      }
    }.toMap
    val got = run("bigram_surprisal").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == exp.keySet)
    // the ln fold is order-dependent; Spark's sum order differs from the
    // Scala fold's, so allow the last clamped digit to wobble while the
    // bigram counts must be exact
    exp.foreach { case (id, (n, s)) =>
      assert(got(id)._1 == n, s"doc $id n_bigrams")
      assert(math.abs(got(id)._2 - s) <= 1e-4 + 1e-9, s"doc $id surprisal")
    }
    // non-vacuous: surprisal varies across docs
    assert(got.values.map(_._2).toSet.size > 10)
  }
}
