package graft

/** Round-8 final batch (#196-#197): independent Scala re-derivations of
  * the semantics at sf0.001.
  */
class AnalyticsR8lSpec extends SparkSpecBase {

  private def r4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("orders_per_customer_stats equals nearest-rank over the count multiset") {
    val counts = graft.sources.Tables(spark, sfDir, "orders")
      .select("o_custkey").collect().map(_.getLong(0))
      .groupBy(identity).values.map(_.length.toLong).toSeq.sorted
    def sel(q: Double) = counts(math.ceil(q * counts.size).toInt - 1)
    val row = run("orders_per_customer_stats").collect()(0)
    assert(row.getLong(0) == counts.size.toLong)
    assert(row.getLong(1) == sel(0.50) && row.getLong(2) == sel(0.90))
    assert(row.getLong(3) == counts.max)
  }

  test("tokens_per_doc_hist: buckets are bit lengths, docs partition, shares sum to 1") {
    val toks = graft.sources.Tables(spark, sfDir, "documents")
      .select("text").collect()
      .map(r => r.getString(0).split(" ", -1).length.toLong)
      .filter(_ > 0)
    val exp = toks.groupBy(n => java.lang.Long.toBinaryString(n).length.toLong)
      .map { case (b, ns) => b -> ((ns.size.toLong, ns.sum)) }
    val got = run("tokens_per_doc_hist").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.view.mapValues(v => (v._1, v._2)).toMap == exp)
    assert(got.values.map(_._1).sum == toks.length.toLong)
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 5e-4)
    got.foreach { case (b, (nd, nt, _)) =>
      // every doc in bucket b has n_tok in [2^(b-1), 2^b): the bucket's
      // token total is bounded by nd·(2^b − 1) and at least nd·2^(b-1)
      assert(nt >= nd * (1L << (b - 1).toInt) && nt < nd * (1L << b.toInt), s"$b")
    }
  }
}
