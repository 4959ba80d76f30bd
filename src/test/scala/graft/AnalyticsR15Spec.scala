package graft

import org.apache.spark.sql.functions._

/** #312-#315 r15 additions: exact Scala re-derivations at sf0.001 plus the
  * bitmap contracts the r14 verdict prescribed (merge identity on the
  * canonical serialized form; state bounds in both container regimes).
  */
class AnalyticsR15Spec extends SparkSpecBase {

  private lazy val events =
    graft.sources.Tables(spark, sfDir, "events")
      .select("event_type", "user_id", "ts", "value")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2),
        r.getDouble(3)))

  test("group_bitmap_ops: exact set algebra equals direct distinct sets") {
    val sets: Map[String, Set[Long]] = events.groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val exp = (for {
      i <- types.indices; j <- (i + 1) until types.size
      a = types(i); b = types(j)
    } yield {
      val sa = sets(a); val sb = sets(b)
      val nAnd = (sa & sb).size.toLong
      (a, b) -> ((sa.size.toLong, sb.size.toLong, nAnd,
        (sa | sb).size.toLong, sa.size + sb.size - 2 * nAnd))
    }).toMap
    val got = run("group_bitmap_ops").collect().map(r =>
      (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6)))).toMap
    assert(got.keySet == exp.keySet && got.size == 10)
    exp.foreach { case (k, v) => assert(got(k) == v, s"pair $k") }
  }

  test("bitmap merge identity: any partitioning and -Merge reagg are byte-equal") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // values chosen to exercise BOTH container forms and the upgrade path:
    // 6000 members in one 65536-range (dense, crosses the 4096 array cap)
    // plus scattered sparse ranges
    val vals = ((1L to 6000L) ++ (1L to 500L).map(_ * 70000L)).map(v => (v % 7, v))
    val df = vals.toDF("g", "v")
    def bytes(d: org.apache.spark.sql.DataFrame) =
      d.collect()(0).getAs[Array[Byte]](0).toSeq
    val onePass = bytes(df.repartition(1)
      .agg(call_function("bitmap_agg", col("v"))))
    val manyParts = bytes(df.repartition(13)
      .agg(call_function("bitmap_agg", col("v"))))
    assert(onePass == manyParts, "partial merge must be order-free")
    val cells = df.groupBy("g")
      .agg(call_function("bitmap_agg", col("v")).as("bm"))
    val merged = bytes(cells.agg(call_function("bitmap_merge", col("bm"))))
    assert(merged == onePass, "bitmap_merge(cells) must equal the one-pass bitmap")
    // and the cardinality read-outs agree with the source set
    val n = spark.range(1).select(
      call_function("bitmap_card",
        lit(onePass.toArray))).collect()(0).getLong(0)
    assert(n == vals.map(_._2).distinct.size.toLong)
  }

  test("bitmap full long domain: negatives fold, count, and intersect exactly (r16)") {
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    // the sign-flip mapping (v XOR Long.MinValue) must make negative ids
    // first-class: mixed-sign sets, extreme values, set algebra — the
    // theta-sketch twin accepts the full domain, so the exact twin must too
    val a = Seq(-5L, -4L, -3L, Long.MinValue, 0L, 3L, Long.MaxValue)
    val b = Seq(-4L, -3L, 0L, 7L, Long.MinValue)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val cells = df.groupBy("g")
      .agg(call_function("bitmap_agg", col("v")).as("bm"))
    val r = cells.agg(
      call_function("bitmap_card", call_function("bitmap_merge", col("bm"))),
      call_function("bitmap_card", call_function("bitmap_intersect_agg", col("bm"))))
      .collect()(0)
    assert(r.getLong(0) == (a.toSet ++ b.toSet).size.toLong, "union card")
    assert(r.getLong(1) == a.toSet.intersect(b.toSet).size.toLong, "intersect card")
    val pair = cells.filter(col("g") === "a").select(col("bm").as("bma"))
      .crossJoin(cells.filter(col("g") === "b").select(col("bm").as("bmb")))
      .select(call_function("bitmap_and_card", col("bma"), col("bmb")),
        call_function("bitmap_or_card", col("bma"), col("bmb")),
        call_function("bitmap_xor_card", col("bma"), col("bmb")))
      .collect()(0)
    assert(pair.getLong(0) == a.toSet.intersect(b.toSet).size.toLong)
    assert(pair.getLong(1) == (a.toSet ++ b.toSet).size.toLong)
    assert(pair.getLong(2) == ((a.toSet -- b.toSet) ++ (b.toSet -- a.toSet)).size.toLong)
  }

  test("bitmap state bound: <=2 bytes/member + container overhead, both forms") {
    import graft.functions.GraftBitmap
    // sparse regime: 1000 members scattered one per 65536-range
    val sparse = new GraftBitmap.Bitmap
    (1L to 1000L).foreach(v => sparse.add(v * 65536L))
    val sb = sparse.serialize.length
    // +4 everywhere (r17): the serialized form now leads with the
    // FormatVersion header so stale pre-r16-remap state fails loudly
    assert(sb <= 8 + 1000 * (8 + 1 + 4 + 2), s"sparse bitmap $sb bytes")
    // dense regime: a full 65536-range costs exactly one 8 KB container,
    // NOT 128 KB of sorted values
    val dense = new GraftBitmap.Bitmap
    (0L until 65536L).foreach(dense.add)
    val db = dense.serialize.length
    assert(db == 8 + 8 + 1 + 4 + 8192, s"dense bitmap $db bytes")
    assert(dense.cardinality == 65536L && sparse.cardinality == 1000L)
    // the array->bitmap upgrade boundary is exact: 4096 stays array form
    val atCap = new GraftBitmap.Bitmap
    (0L until 4096L).foreach(atCap.add)
    assert(atCap.serialize.length == 8 + 8 + 1 + 4 + 2 * 4096)
    atCap.add(4096L)
    assert(atCap.serialize.length == 8 + 8 + 1 + 4 + 8192, "4097th member upgrades")
  }

  test("bitmap state version header: stale/foreign bytes fail loudly") {
    import graft.functions.GraftBitmap
    // r17 (ADVICE item 3): the r16 sign-flip remap changed what serialized
    // bytes MEAN; the FormatVersion header makes pre-remap (or foreign)
    // state throw here instead of silently decoding to different members.
    val bm = new GraftBitmap.Bitmap
    (1L to 10L).foreach(bm.add)
    val bytes = bm.serialize
    assert(java.nio.ByteBuffer.wrap(bytes).getInt == GraftBitmap.FormatVersion)
    assert(GraftBitmap.deserialize(bytes).cardinality == 10L)
    // a pre-r17 payload led with the container count (a small int)
    intercept[IllegalArgumentException](GraftBitmap.deserialize(bytes.drop(4)))
  }

  test("funnel_strict_increase: levels match a greedy strict-ts re-derivation") {
    val m = events.filter(e => Set("signup", "click", "purchase")(e._1))
      .map(e => (e._2, e._3.getTime * 1000 + e._3.getNanos / 1000 % 1000, e._1))
    val exp = m.groupBy(_._1).view.mapValues { es =>
      def minAfter(ch: String, after: Long): Option[Long] = {
        val c = es.filter(e => e._3 == (ch match {
          case "s" => "signup"; case "c" => "click"; case _ => "purchase"
        }) && e._2 > after).map(_._2)
        if (c.isEmpty) None else Some(c.min)
      }
      val t1 = minAfter("s", Long.MinValue)
      val t2 = t1.flatMap(minAfter("c", _))
      val t3 = t2.flatMap(minAfter("p", _))
      if (t3.isDefined) 3L else if (t2.isDefined) 2L else if (t1.isDefined) 1L else 0L
    }.toMap.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = run("funnel_strict_increase").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == exp, s"got $got exp $exp")
  }

  test("bitmap_coverage: n-way union/intersection equal direct set algebra") {
    val sets = events.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expAny = sets.values.reduce(_ | _).size.toLong
    val expAll = sets.values.reduce(_ & _).size.toLong
    val r = run("bitmap_coverage").collect()(0)
    assert(r.getLong(0) == sets.size.toLong)
    assert(r.getLong(1) == expAny, "n_any")
    assert(r.getLong(2) == expAll, "n_all")
    // intersection-aggregate partial-merge identity: split cells across
    // partitions, same bytes (the canonical-form contract on the dual agg)
    graft.functions.GraftFunctions.register(spark)
    import spark.implicits._
    val cells = events.toSeq.toDF("event_type", "user_id", "ts", "value")
      .groupBy("event_type")
      .agg(call_function("bitmap_agg", col("user_id")).as("bm"))
    def andBytes(parts: Int) = cells.repartition(parts)
      .agg(call_function("bitmap_intersect_agg", col("bm")))
      .collect()(0).getAs[Array[Byte]](0).toSeq
    assert(andBytes(1) == andBytes(7), "intersection partials must merge exactly")
  }

  test("funnel_strict_increase teeth: same-instant events do not advance") {
    // the fixture corpus puts EVERY user at level 3 (dense histories), so
    // the strict-increase constraint and levels 0-2 are never exercised by
    // the oracle row — pin them on a synthetic corpus (the jarque_bera
    // over-bound / embed_norm_check broken-vector discipline)
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("strict_inc").toString
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val rows = Seq(
      // u1: s then c AT THE SAME instant -> c does not count; level 1
      (1L, "signup", ts(10)), (1L, "click", ts(10)),
      // u2: full strictly-increasing chain -> level 3
      (2L, "signup", ts(10)), (2L, "click", ts(20)), (2L, "purchase", ts(30)),
      // u3: c and p both present but p NOT after c -> level 2
      (3L, "signup", ts(10)), (3L, "click", ts(20)), (3L, "purchase", ts(20)),
      // u4: never signed up -> level 0
      (4L, "click", ts(5)), (4L, "purchase", ts(6)),
      // u5: strict_order would fail (intervening click before the s->c->p
      // chain completes out of contiguity) but strict_increase passes:
      // s(10), p(15), c(20), p(25) -> greedy s=10, c=20, p=25 -> level 3
      (5L, "signup", ts(10)), (5L, "purchase", ts(15)),
      (5L, "click", ts(20)), (5L, "purchase", ts(25)))
    rows.toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val got = SparkEntry.queries("funnel_strict_increase")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 2L), s"got $got")
  }

  test("mean_ztest: z and CI match the exact-sum re-derivation bit-for-bit") {
    val click = events.filter(_._1 == "click").map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val view = events.filter(_._1 == "view").map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    val nx = click.size.toLong; val ny = view.size.toLong
    val sx = click.sum.toDouble; val sy = view.sum.toDouble
    val dmean = sx / nx - sy / ny
    val se = math.sqrt(2500.0 / nx + 2500.0 / ny)
    val r = run("mean_ztest").collect()(0)
    assert(r.getLong(0) == nx && r.getLong(1) == ny)
    assert(r.getDouble(2) == dmean, "dmean")
    assert(r.getDouble(3) == dmean / se, "z_stat")
    assert(r.getDouble(4) == dmean - 1.96 * se, "ci_low")
    assert(r.getDouble(5) == dmean + 1.96 * se, "ci_high")
  }

  test("embed_gram: 2080 exact micro-unit cells match a BigInt re-derivation") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("embedding").collect().map(_.getSeq[Float](0))
    val dim = vecs.head.size
    val q = vecs.map(_.map(x => math.floor(x.toDouble * 1000000).toLong).toArray)
    val exp = (for (i <- 0 until dim; j <- i until dim) yield {
      var s = BigInt(0)
      q.foreach(v => s += BigInt(v(i)) * BigInt(v(j)))
      val g = BigDecimal(s.toDouble / vecs.length / 1e12)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      (i + 1L, j + 1L) -> ((vecs.length.toLong, g))
    }).toMap
    val got = run("embed_gram").collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got.size == dim * (dim + 1) / 2 && got.keySet == exp.keySet)
    exp.foreach { case (k, v) => assert(got(k) == v, s"cell $k") }
  }

  test("whitening: W^T C W = I on the fixture covariance (eigen step)") {
    val (cov, w) = graft.ann.Whitening.whiteningOf(spark, sfDir)
    val id = graft.ann.Whitening.sandwich(w, cov)
    val n = id.length
    var maxOff = 0.0; var maxDiagErr = 0.0
    for (i <- 0 until n; j <- 0 until n) {
      if (i == j) maxDiagErr = math.max(maxDiagErr, math.abs(id(i)(j) - 1.0))
      else maxOff = math.max(maxOff, math.abs(id(i)(j)))
    }
    assert(maxOff < 1e-6, s"off-diagonal $maxOff")
    assert(maxDiagErr < 1e-4, s"diagonal error $maxDiagErr")
  }
}
