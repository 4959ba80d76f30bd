package graft

import org.apache.spark.sql.functions._

/** #306-#308 r14 additions: exact Scala re-derivations at sf0.001 plus the
  * KMV sketch-regime pins the DuckDB oracle can't reach (the oracle runs
  * the exact regime only — CapacityPins.KmvCap ≥ distinct at local SFs).
  */
class AnalyticsR14Spec extends SparkSpecBase {

  private lazy val events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("event_type", "user_id", "ts")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2)))

  private def dayOf(ts: java.sql.Timestamp): Long =
    Math.floorDiv(Math.floorDiv(ts.getTime, 1000L), 86400L)

  /** The portable 60-bit md5 hash (parity.md5Long twin). */
  private def h60(v: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(v.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("uniq_theta_ops: exact-regime set algebra equals direct distinct sets") {
    val sets: Map[String, Set[Long]] = events.groupBy(_._1)
      .view.mapValues(_.map(e => h60(e._2)).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val exp = (for {
      i <- types.indices; j <- (i + 1) until types.size
      a = types(i); b = types(j)
    } yield {
      val sa = sets(a); val sb = sets(b)
      val ni = (sa & sb).size.toLong
      val nu = (sa | sb).size.toLong
      (a, b) -> ((sa.size.toLong, sb.size.toLong, nu, ni,
        BigDecimal(ni.toDouble / nu)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }).toMap
    val got = run("uniq_theta_ops").collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6)))).toMap
    assert(got.keySet == exp.keySet && got.size == 10)
    exp.foreach { case (k, v) => assert(got(k) == v, s"pair $k") }
  }

  test("KMV sketch regime: estimator inside the 1/sqrt(k) error window") {
    // force the sub-capacity regime the oracle never sees: k = 256 over
    // the full user-hash domain (150 users at sf0.001 is EXACT at 256, so
    // sketch doc_id hashes of the larger lineitem key domain instead)
    graft.functions.GraftFunctions.register(spark)
    val k = 256
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
      .select(graft.ops.parity.md5Long(
        concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("h"))
    val exactN = li.distinct().count()
    assert(exactN > 4L * k, "fixture too small to leave the exact regime")
    val retained = li
      .agg(call_function("kmv_sketch", col("h"), lit(k)).as("sk"))
      .collect()(0).getSeq[Long](0).toArray
    assert(retained.length == k, "sketch must saturate")
    val est = graft.functions.KmvAgg.estimate(retained, k)
    val relErr = math.abs(est - exactN) / exactN
    // σ ≈ 1/√(k−2) ≈ 6.3% at k=256; 4σ keeps the spec deterministic-stable
    assert(relErr < 0.25, s"KMV estimate $est vs exact $exactN (relErr $relErr)")
  }

  test("KMV merge: partition-split partials and kmv_merge reagg are loss-free") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val k = 64
    val vals = (1L to 5000L).map(v => (v % 7, h60(v)))
    val df = vals.toDF("g", "h")
    val onePass = df.repartition(1)
      .agg(call_function("kmv_sketch", col("h"), lit(k)))
      .collect()(0).getSeq[Long](0)
    val manyParts = df.repartition(13)
      .agg(call_function("kmv_sketch", col("h"), lit(k)))
      .collect()(0).getSeq[Long](0)
    assert(onePass == manyParts, "partial merge must be order-free")
    // -Merge over persisted per-group read-outs ≡ one-pass over the union
    val cells = df.groupBy("g")
      .agg(call_function("kmv_sketch", col("h"), lit(k)).as("sk"))
    val merged = cells
      .agg(call_function("kmv_merge", col("sk"), lit(k)))
      .collect()(0).getSeq[Long](0)
    assert(merged == onePass, "kmv_merge(cells) must equal the one-pass sketch")
    // kmv_merge is a registered SQL function, so callers may hand it ANY
    // long array — not just ascending kmv_sketch read-outs. Pin that a
    // DESCENDING input merges identically (r14 ADVICE: an ascending-only
    // early exit silently dropped elements of unsorted input).
    val mergedRev = cells.select(reverse(col("sk")).as("sk"))
      .agg(call_function("kmv_merge", col("sk"), lit(k)))
      .collect()(0).getSeq[Long](0)
    assert(mergedRev == onePass, "kmv_merge must be order-insensitive")
  }

  test("KMV pair algebra: saturated-regime union/intersect error windows") {
    // the oracle only ever sees the exact regime (CapacityPins.KmvCap ≥
    // distinct at every gate SF) — pin the ESTIMATOR regime of the same
    // kmvPairAlgebra column spelling the query runs: two overlapping
    // 20k-element hash domains at k=256 (both sketches saturate)
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val k = 256
    val a = (1L to 20000L).map(v => ("a", h60(v)))
    val b = (10001L to 30000L).map(v => ("b", h60(v)))
    val sk = (a ++ b).toDF("g", "h")
      .groupBy("g").agg(call_function("kmv_sketch", col("h"), lit(k)).as("sk"))
    val pr = sk.filter($"g" === "a").select($"sk".as("ska"))
      .crossJoin(sk.filter($"g" === "b").select($"sk".as("skb")))
    val r = pr.select(graft.ops.AnalyticsR14.kmvPairAlgebra($"ska", $"skb", k): _*)
      .collect()(0)
    val (nA, nB, nU, nI) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def relErr(est: Long, exact: Long) = math.abs(est - exact).toDouble / exact
    // σ ≈ 1/√(k−2) ≈ 6.3% for the marginals/union; intersect compounds
    // ρ̂'s binomial error (count_below_θ ≈ ρ·k ≈ 85 ⇒ ~11%) on top — 4σ-ish
    // bounds keep the deterministic fixture stable
    assert(relErr(nA, 20000L) < 0.25, s"n_a=$nA")
    assert(relErr(nB, 20000L) < 0.25, s"n_b=$nB")
    assert(relErr(nU, 30000L) < 0.25, s"n_union=$nU")
    assert(relErr(nI, 10000L) < 0.45, s"n_intersect=$nI")
  }

  test("embed_norm_check: exact quantized re-derivation; clean corpus passes") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    // the identical ascending double fold as norm_sq / the oracle list_sum
    def q(e: Seq[Float]): Long = {
      var ss = 0.0
      e.foreach { x => val d = x.toDouble; ss += d * d }
      math.floor(ss * 1000000).toLong
    }
    val exp = vecs.groupBy(_._2).map { case (lbl, vs) =>
      val qs = vs.map(v => (v._1, q(v._3)))
      val bad = qs.filter(x => math.abs(x._2 - 1000000L) > 1000L)
      lbl -> ((qs.length.toLong, bad.length.toLong, bad.map(_._1).sum,
        qs.map(_._2).min, qs.map(_._2).max))
    }
    val got = run("embed_norm_check").collect().map(r =>
      r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (l, v) => assert(got(l) == v, s"label $l") }
    // the fixture corpus IS unit-normalized — the audit must say so
    assert(got.values.forall(_._2 == 0L), "clean corpus flagged unnormalized")
  }

  test("embed_norm_check flags synthetic broken vectors (the screen's teeth)") {
    // the clean fixture can never exercise the flagging path, so pin it on
    // a synthetic corpus with deliberately broken rows (the jarque_bera
    // over-bound discipline): a zero vector, a blown-up vector, and a
    // just-out-of-tolerance one among normalized rows
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("norm_check").toString
    def unit(seed: Int): Seq[Float] = {
      val raw = (1 to 8).map(i => ((seed * 31 + i * 7) % 13 + 1).toFloat)
      val n = math.sqrt(raw.map(x => x.toDouble * x).sum)
      raw.map(x => (x / n).toFloat)
    }
    val rows = Seq(
      (1L, unit(1), 0), (2L, unit(2), 0),
      (3L, Seq.fill(8)(0.0f), 0),               // zero vector → q = 0
      (4L, unit(4).map(_ * 2.0f), 1),           // norm² ≈ 4 → flagged
      (5L, unit(5), 1),
      (6L, unit(6).map(_ * 1.001f), 1))         // norm² ≈ 1.002 → flagged
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val got = SparkEntry.queries("embed_norm_check")(spark, tmp).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got(0) == ((1L, 3L)), s"label 0: ${got(0)}") // vec 3 flagged
    assert(got(1) == ((2L, 10L)), s"label 1: ${got(1)}") // vecs 4+6 flagged
  }

  test("relational_division: covering users match a direct DOW re-derivation") {
    val nd = events.groupBy(e => (e._1, e._2))
      .view.mapValues(_.map(e => dayOf(e._3) % 7).toSet.size).toMap
    // note: Map.collect-to-pairs would rebuild a MAP keyed by t (silently
    // deduping users) — filter + keys keeps every covering (t, u)
    val exp = nd.filter(_._2 == 7).keys.toSeq
      .groupBy(_._1)
      .view.mapValues { us =>
        val ids = us.map(_._2)
        (ids.size.toLong, ids.min, ids.max, ids.sum)
      }.toMap
    val got = run("relational_division").collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, v) => assert(got(t) == v, s"type $t") }
    assert(got.nonEmpty, "no covering users at the fixture SF — vacuous op")
  }

  test("trending_topk: exact shifted-integer decay ranks match a re-derivation") {
    val lastD = events.groupBy(_._1).view.mapValues(_.map(e => dayOf(e._3)).max).toMap
    val w = events.groupBy(e => (e._1, e._2)).view.mapValues { es =>
      es.map { e =>
        val gap = lastD(e._1) - dayOf(e._3)
        if (gap <= 31) 1L << (31 - gap) else 0L
      }.sum
    }.toMap
    val exp = w.toSeq.collect { case ((t, u), s) if s > 0 => (t, u, s) }
      .groupBy(_._1)
      .view.mapValues(_.sortBy { case (_, u, s) => (-s, u) }.take(5)
        .zipWithIndex.map { case ((_, u, s), i) => (i + 1L, u, s) })
      .toMap
    val got = run("trending_topk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
      .view.mapValues(_.sortBy(_._2).map(x => (x._2, x._3, x._4)).toSeq).toMap
    assert(got.keySet == exp.keySet)
    exp.foreach { case (t, rows) => assert(got(t) == rows, s"type $t") }
  }
}
