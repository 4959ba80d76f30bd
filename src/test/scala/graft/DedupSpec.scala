package graft

import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {

  test("simhash multi-band pairs have recall 1.0 at radius 2 (pigeonhole)") {
    // exact all-pairs hamming over the collected signatures (small N)
    graft.functions.GraftFunctions.register(spark)
    val sigs = graft.sources.Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        call_function("simhash64", array_distinct(split(col("text"), " "))).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val exact = (for {
      (a, sa) <- sigs; (b, sb) <- sigs
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 2
    } yield (a, b)).toSet
    val banded = graft.dedup.Dedup.simhashPairs(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact,
      s"missed ${(exact -- banded).size}, extra ${(banded -- exact).size}")
    assert(exact.nonEmpty, "fixture must contain radius-2 pairs")
  }

  test("dedup clusters: pair endpoints share a cluster, canonical is the min") {
    val clusters = run("dedup_clusters").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty)
    // every near-dup pair's endpoints land in the same cluster
    val pairs = graft.dedup.Dedup.simhashPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(clusters(a) == clusters(b), s"pair ($a,$b) split across clusters")
    }
    // the cluster id is a member, and it is the minimum member
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.keys.toSeq)
    byCluster.foreach { case (cid, members) =>
      assert(members.min == cid, s"cluster $cid min is ${members.min}")
    }
  }

  test("clusters small-graph fast path equals distributed propagation") {
    val pairs = graft.dedup.Dedup.simhashPairs(spark, sfDir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val fast = graft.dedup.Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dist = graft.dedup.Dedup.connectedComponents(pairs, smallGraphEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast.nonEmpty && fast == dist)
  }

  test("prefix filter prunes hot-boilerplate non-dups without any df cap") {
    import spark.implicits._
    // 40 docs share ONE boilerplate 3-gram ("hot hot hot"); all other
    // shingles are doc-unique, so every pairwise Jaccard is 1/9 < 0.5. An
    // uncapped block self-join would emit the full 40·39/2 pair blowup on
    // the hot shingle alone; the prefix filter emits ZERO candidates —
    // each doc's τ=0.5 prefix (its 3 rarest of 5 shingles) holds only
    // doc-unique shingles, so nothing collides. Same shuffle-safety the
    // old df-cap bought, with no recall loss to buy it.
    val docsDf = (1L to 40L).map { i =>
      (i, "en", "web", s"hot hot hot u$i v$i w$i x$i")
    }.toDF("doc_id", "lang", "source", "text")
    val e = graft.dedup.Dedup.shingleRowsOf(docsDf)
    assert(graft.dedup.Dedup.prefixCandidates(e, 1, 2, 0.5,
      bothPrefixes = true).count() == 0)
    // tau=0 → prefix is the whole set → complete uncapped pair generation
    assert(graft.dedup.Dedup.prefixCandidates(e, 0, 1, 0.0).count()
      == 40L * 39 / 2)
  }

  test("prefix filter recalls near-dup families the old df-cap lost") {
    import spark.implicits._
    // 40 near-identical docs: 3 shared shingles (df=40 each) + 1 unique.
    // Pairwise Jaccard = 3/5 = 0.6 ≥ 0.5, but every SHARED shingle is
    // hotter than the old df-cap of 8 — the r1-r9 capped candidate
    // generation found 0 of these pairs. The prefix filter (prefix length
    // ℓ = 4 − 2 + 1 = 3 reaches into the shared shingles) finds all 780.
    val docsDf = (1L to 40L).map { i =>
      (i, "en", "web", s"t1 t2 t3 t4 t5 u$i")
    }.toDF("doc_id", "lang", "source", "text")
    val e = graft.dedup.Dedup.shingleRowsOf(docsDf)
    assert(graft.dedup.Dedup.prefixCandidates(e, 1, 2, 0.5,
      bothPrefixes = true).count() == 40L * 39 / 2)
    val verified = graft.dedup.Dedup.ngramJaccardPairs(docsDf, tau = 0.5)
    assert(verified.count() == 40L * 39 / 2)
    assert(verified.collect().forall(_.getDouble(2) == 0.6))
  }

  test("prefix candidates are complete vs brute force, sizes correct") {
    import spark.implicits._
    // mixed fixture: two near-dup families, boilerplate hot shingles,
    // singletons, a cross-block twin (must NOT pair), varied sizes
    val docsDf = (Seq(
      (1L, "en", "web", "a b c d e f g h"),
      (2L, "en", "web", "a b c d e f g z"),
      (3L, "en", "web", "a b c d e f g h i j k l m n o p"), // superset of 1
      (4L, "en", "web", "q r s t u v w x"),
      (5L, "en", "web", "q r s t u v w y"),
      (6L, "en", "news", "a b c d e f g h"), // other block: never pairs w/ 1
      (7L, "en", "web", "completely different text here now")
    ) ++ (10L to 29L).map(i => (i, "en", "web", s"hot hot hot hot u$i v$i")))
      .toDF("doc_id", "lang", "source", "text")
    def shingles(t: String): Set[String] = {
      val ws = t.split(" ")
      (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
    }
    val rows = docsDf.collect().map(r =>
      (r.getLong(0), (r.getString(1), r.getString(2)), shingles(r.getString(3))))
    for ((tauNum, tauDen, sizeTau, both, metric) <- Seq(
        (1, 2, 0.5, true, "jaccard"), (7, 10, 0.0, false, "containment"))) {
      val tau = tauNum.toDouble / tauDen
      val want = (for {
        (a, blkA, sa) <- rows; (b, blkB, sb) <- rows
        if a < b && blkA == blkB
        i = sa.intersect(sb).size.toDouble
        m = if (metric == "jaccard") i / (sa.size + sb.size - i)
            else i / math.min(sa.size, sb.size)
        if m >= tau
      } yield (a, b)).toSet
      val got = graft.dedup.Dedup.prefixCandidates(
          graft.dedup.Dedup.shingleRowsOf(docsDf), tauNum, tauDen, sizeTau,
          both)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getLong(2), r.getLong(3)))
      // complete: every qualifying pair is a candidate
      val gotPairs = got.map(p => (p._1, p._2)).toSet
      assert(want.subsetOf(gotPairs),
        s"$metric missing ${(want -- gotPairs).take(5)}")
      assert(want.nonEmpty, s"$metric fixture vacuous")
      // sizes ride along correctly, aligned to the id-ordered pair
      val sizeOf = rows.map(r => r._1 -> r._3.size).toMap
      got.foreach { case (a, b, na, nb) =>
        assert(na == sizeOf(a) && nb == sizeOf(b), s"sizes wrong for ($a,$b)")
      }
      // cross-block twin stays unpaired
      assert(!gotPairs.contains((1L, 6L)))
    }
  }

  test("hot-bucket guard bounds simhash candidate generation") {
    import spark.implicits._
    // byte-identical docs: one signature, one bucket per band, d² pairs
    // uncapped. The guard drops the bucket entirely (exact dedup upstream
    // is the right tool for identical text).
    val docsDf = (1L to 40L)
      .map(i => (i, "all the same boilerplate text body here"))
      .toDF("doc_id", "text")
    val uncapped = graft.dedup.Dedup.simhashPairsOf(docsDf, bucketCap = Int.MaxValue)
    val capped = graft.dedup.Dedup.simhashPairsOf(docsDf, bucketCap = 8)
    assert(uncapped.count() == 40L * 39 / 2)
    assert(capped.count() == 0)
  }

  test("hot-bucket guard bounds minhash-lsh candidate generation") {
    import spark.implicits._
    val docsDf = (1L to 40L)
      .map(i => (i, "en", "web", "one two three four five six seven"))
      .toDF("doc_id", "lang", "source", "text")
    val e = graft.dedup.Dedup.shingleRowsOf(docsDf).select("doc_id", "h")
    val uncapped = graft.dedup.Dedup.minhashCandidates(spark, e, bucketCap = Int.MaxValue)
    val capped = graft.dedup.Dedup.minhashCandidates(spark, e, bucketCap = 8)
    assert(uncapped.count() == 40L * 39 / 2)
    assert(capped.count() == 0)
  }

  test("LSH hot-bucket cap is runtime-tunable via spark conf and API param") {
    import spark.implicits._
    val hotSim = (1L to 40L)
      .map(i => (i, "all the same boilerplate text body here"))
      .toDF("doc_id", "text")
    try {
      // conf knob reaches the full public operator without explicit params
      spark.conf.set(graft.dedup.Dedup.LshBucketCapKey, "8")
      assert(graft.dedup.Dedup.lshBucketCap(spark) == 8)
      assert(graft.dedup.Dedup.simhashPairsOf(hotSim).count() == 0,
        "conf-set bucket cap must reach simhashPairsOf")
      // explicit param overrides the conf (40 identical docs, cap 100 holds them)
      assert(graft.dedup.Dedup.simhashPairsOf(hotSim, bucketCap = 100).count()
        == 40L * 39 / 2)
    } finally {
      spark.conf.unset(graft.dedup.Dedup.LshBucketCapKey)
    }
    // defaults restored: conf-free resolution falls back to the constant
    assert(graft.dedup.Dedup.lshBucketCap(spark) == graft.dedup.Dedup.LshBucketCap)
  }

  test("exact dedup emits only non-keeper ids, keeper < dup") {
    val rows = run("dedup_exact").collect()
    assert(rows.forall(r => r.getLong(1) < r.getLong(0)))
  }

  test("normalized exact dedup: non-vacuous at the fixture SF, canonical keys") {
    val rows = run("dedup_exact_norm").collect()
    assert(rows.nonEmpty, "normalized dedup must find matches at sf0.001")
    assert(rows.forall(r => r.getLong(1) < r.getLong(0)))
    // reordered / re-cased / word-repeated variants collapse to one keeper
    import spark.implicits._
    val docsDf = Seq(
      (1L, "alpha beta gamma"),
      (2L, "Gamma ALPHA beta"),
      (3L, "beta beta gamma alpha"),
      (4L, "entirely different words")).toDF("doc_id", "text")
    import org.apache.spark.sql.functions.{array_distinct, array_sort, col, concat_ws, lower, md5, min, split}
    val h = docsDf.select(col("doc_id"),
      md5(concat_ws(" ",
        array_sort(array_distinct(split(lower(col("text")), " "))))).as("th"))
    val keep = h.groupBy("th").agg(min("doc_id").as("keep_id"))
    val got = h.join(keep, "th").filter(col("doc_id") =!= col("keep_id"))
      .select("doc_id", "keep_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((2L, 1L), (3L, 1L)))
  }

  test("minhash-lsh pairs all meet the jaccard threshold, ordered a<b") {
    val rows = run("dedup_minhash_lsh").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(2) >= 0.35 && r.getLong(0) < r.getLong(1)))
  }

  test("ngram-jaccard pairs are a subset of blocks and meet tau") {
    val rows = run("dedup_ngram_jaccard").collect()
    assert(rows.forall(r => r.getDouble(2) >= 0.5 && r.getLong(0) < r.getLong(1)))
  }

  test("simhash is a total map with 60-bit signatures") {
    val rows = run("dedup_simhash").collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.getLong(1) >= 0L && r.getLong(1) < (1L << 60)))
  }

  test("identical texts get identical simhash; near-identical differ in few bits") {
    val byText = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "md5(text) th").collect()
      .groupBy(_.getString(1)).values.filter(_.length > 1)
    val sig = run("dedup_simhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byText.foreach { g => assert(g.map(r => sig(r.getLong(0))).toSet.size == 1) }
  }

  test("embedding near-dup pairs stay within a label block") {
    val lbl = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = run("dedup_embedding").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => lbl(r.getLong(0)) == lbl(r.getLong(1))))
  }

  test("nearDupEmbedding tolerates null vectors, dim mismatches, dup ids") {
    // The kernel is reachable from arbitrary caller frames via the public
    // facade (r14 advice): a null embedding must be skipped (the pre-r13
    // per-pair cosine_sim returned NULL → dropped), a length-mismatched
    // pair dropped, and a duplicated vec_id must not emit an (a,a)
    // self-pair.
    import spark.implicits._
    val base = Seq(1.0f, 0.0f, 0.0f, 0.0f)
    val near = Seq(0.9f, 0.1f, 0.0f, 0.0f)
    val rows = Seq(
      ("blk", 1L, base), ("blk", 2L, near),
      ("blk", 3L, null.asInstanceOf[Seq[Float]]), // null embedding
      ("blk", 4L, Seq(1.0f, 0.0f)),               // wrong dimension
      ("blk", 5L, base), ("blk", 5L, base)        // duplicated vec_id
    ).toDF("label", "vec_id", "e")
    val out = Graft(spark, sfDir).nearDupEmbedding(rows, tau = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.forall { case (a, b) => a < b }, "self-pair or unordered pair")
    assert(!out.exists { case (a, b) => a == 3L || b == 3L }, "null vec paired")
    assert(!out.exists { case (a, b) => a == 4L || b == 4L }, "dim-mismatch paired")
    // the real near-dups all survive
    assert(out.toSet == Set((1L, 2L), (1L, 5L), (2L, 5L)))
  }

  /** Unit 8-dim vector in the plane of dims (d, d+1), angle theta. */
  private def planeVec(d: Int, theta: Double): Seq[Float] = {
    val v = Array.fill(8)(0.0f)
    v(d) = math.cos(theta).toFloat
    v(d + 1) = math.sin(theta).toFloat
    v.toSeq
  }

  private def md5Rank(ids: Seq[Long]): Map[Long, Int] =
    ids.sortBy { id =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.zipWithIndex.toMap

  test("semdedup auto-switch: cell path ≡ label path when cells coincide with labels") {
    // r14 verdict item 1: the √n-cell contract is now the nearDupEmbedding
    // DEFAULT. On a fixture whose trained cells coincide with its labels
    // the switch must be invisible — bit-identical pairs (the kernel and
    // its IEEE chain are shared; only the block key changed).
    //
    // Fixture: two well-separated tight clusters (within-cos ≥ 0.995,
    // cross-cos = 0), labels = clusters. Lloyd seeds are the k smallest
    // md5(vec_id) — membership is assigned by md5 RANK so seed 0 lands in
    // cluster A and seed 1 in cluster B deterministically, making the
    // 2-cell training label-pure after the first assignment.
    import spark.implicits._
    val ids = (1L to 120L)
    val rank = md5Rank(ids)
    val rows = ids.map { id =>
      val r = rank(id)
      val cluster = r % 2 // rank 0 → A, rank 1 → B, rest alternate
      val theta = (r / 2 % 10) * 0.01
      (if (cluster == 0) "A" else "B", id, planeVec(cluster * 3, theta))
    }
    val v = rows.toDF("label", "vec_id", "e")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val labelPath = pairs(graft.dedup.Dedup.blockCosinePairs(v, 0.9))
    val conf = spark.conf
    conf.set(graft.dedup.Dedup.MaxBlockKey, 50) // both 60-row labels oversized
    conf.set(graft.dedup.Dedup.SemCellsKey, 2)
    try {
      val cellPath = pairs(graft.dedup.Dedup.semdedupPairs(v, 0.9))
      assert(labelPath.nonEmpty, "vacuous fixture")
      assert(cellPath == labelPath, "auto-switch changed the pair set")
    } finally {
      conf.unset(graft.dedup.Dedup.MaxBlockKey)
      conf.unset(graft.dedup.Dedup.SemCellsKey)
    }
    // below the threshold the code path IS blockCosinePairs — also pin the
    // facade default end-to-end on the untouched conf
    val facade = pairs(Graft(spark, sfDir).nearDupEmbedding(v, tau = 0.9))
    assert(facade == labelPath)
  }

  test("semdedup auto-switch: refinement stays within labels; small blocks exact") {
    // Mixed fixture: one oversized tight cluster (its 2 trained cells SPLIT
    // it — the deliberate SemDeDup approximation) + one small label. The
    // contract: every emitted pair is still within-label, the small label's
    // pairs are EXACT, and the cell path is a subset of the label path.
    import spark.implicits._
    val bigRows = (1L to 60L).map(id => ("big", id, planeVec(0, (id % 10) * 0.01)))
    val smallRows = (100L to 129L).map(id => ("sm", id, planeVec(4, (id % 10) * 0.01)))
    val v = (bigRows ++ smallRows).toDF("label", "vec_id", "e")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val labelPath = pairs(graft.dedup.Dedup.blockCosinePairs(v, 0.9))
    val conf = spark.conf
    conf.set(graft.dedup.Dedup.MaxBlockKey, 50)
    conf.set(graft.dedup.Dedup.SemCellsKey, 2)
    try {
      val cellPath = pairs(graft.dedup.Dedup.semdedupPairs(v, 0.9))
      val smallExpected = labelPath.filter(_._1 >= 100L)
      assert(cellPath.filter(_._1 >= 100L) == smallExpected,
        "small label's exact pairs were touched")
      assert(cellPath.subsetOf(labelPath), "emitted a cross-label pair")
      assert(cellPath.filter(_._1 < 100L).nonEmpty,
        "oversized label lost ALL pairs — cells degenerated")
    } finally {
      conf.unset(graft.dedup.Dedup.MaxBlockKey)
      conf.unset(graft.dedup.Dedup.SemCellsKey)
    }
  }

  test("embed_contamination equals a direct max-cos recompute; flag = n_close>0") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val bench = vecs.filter(_._1 % 100 == 0)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val exp = vecs.filter(_._1 % 100 != 0).map { case (id, e) =>
      val cs = bench.map { case (_, eb) => cos(e, eb) }
      id -> ((cs.max, cs.count(_ >= 0.35).toLong))
    }.toMap
    val got = run("embed_contamination").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, (mc, nc, flag)) =>
      val (emc, enc) = exp(id)
      assert(math.abs(mc - emc) < 5e-5, s"vec $id max_cos $mc vs $emc")
      assert(nc == enc, s"vec $id n_close")
      assert(flag == (if (enc > 0) 1L else 0L), s"vec $id flag")
    }
    assert(got.values.exists(_._3 == 1L), "no contaminated vector — vacuous fixture")
  }

  test("contamination flags only docs sharing a full 8-gram with the benchmark") {
    val s = spark
    import s.implicits._
    val eight = "a b c d e f g h"
    val bench = Seq((100L, s"$eight tail words here")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"prefix $eight suffix"),        // shares the 8-gram → flagged
      (2L, "a b c d e f g DIFFERENT"),      // 7-word overlap only → clean
      (3L, "totally unrelated text with many distinct words")).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.contaminationOf(corpus, bench).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L))
  }

  test("dedup_substring: fractions bounded and non-vacuous on the fixture") {
    val rows = run("dedup_substring").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.forall { case (_, n, d, f) => d <= n && f >= 0.0 && f <= 1.0 })
    assert(rows.exists(_._3 > 0), "no duplicated spans anywhere — vacuous fixture")
    assert(rows.exists(_._3 == 0), "every doc duplicated — degenerate fixture")
  }

  test("substringDupStats ground truth: full copies, partial overlap, clean docs") {
    val s = spark
    import s.implicits._
    val run8 = "q w e r t y u i" // one shared 8-gram
    val docsDf = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"), // original
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota"), // exact copy
      (3L, s"own prefix words here then $run8"),                  // shares 1 gram w/ 4
      (4L, s"$run8 and then its very own suffix"),
      (5L, "completely unrelated text with eight distinct words present")
    ).toDF("doc_id", "text")
    val got = graft.dedup.Dedup.substringDupStats(docsDf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // exact copies: every gram duplicated in the twin
    assert(got(1L)._3 == 1.0 && got(2L)._3 == 1.0)
    // partial overlap: exactly the one shared 8-gram
    assert(got(3L)._2 == 1L && got(4L)._2 == 1L)
    assert(got(3L)._3 > 0.0 && got(3L)._3 < 1.0)
    // clean doc: zero duplicated spans
    assert(got(5L)._2 == 0L && got(5L)._3 == 0.0)
  }

  test("containment pairs equal the exact shingle-set oracle") {
    // independent Scala re-derivation: same 3-gram/h32 shingles, ALL
    // same-block pairs sharing any shingle, containment over FULL sets
    // (since r11 the candidate generation is the complete prefix filter —
    // no df-cap, so the oracle is the plain uncapped semantics)
    def h32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)), r.getString(3)))
    val sets = docs.map { case (d, blk, t) =>
      val ws = t.split(" ", -1)
      val sh =
        if (ws.length < 3) Set.empty[Long]
        else (0 to ws.length - 3)
          .map(i => h32(ws.slice(i, i + 3).mkString(" "))).toSet
      (d, blk) -> sh
    }.filter(_._2.nonEmpty)
    val exp = (for {
      ((a, blkA), sa) <- sets; ((b, blkB), sb) <- sets
      if a < b && blkA == blkB
      shared = sa.intersect(sb)
      if shared.nonEmpty // block-join candidate
      c = shared.size.toDouble / math.min(sa.size, sb.size)
      if c >= 0.7
    } yield (a, b,
      BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
      if (sa.size <= sb.size) "a" else "b")).toSet
    val got = run("dedup_containment").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))).toSet
    assert(got == exp,
      s"missing ${(exp -- got).take(3)}, extra ${(got -- exp).take(3)}")
    assert(exp.nonEmpty, "fixture has no containment pairs — oracle vacuous")
  }

  test("dedup_lines matches a full Scala re-derivation of the segment pipeline") {
    def h48(w: String): BigInt = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      BigInt(md.take(12), 16)
    }
    val docsRows = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    // segment each doc into fixed 8-word windows over non-empty words,
    // signature = positional-weighted 48-bit word-hash sum
    val segs = docsRows.flatMap { case (id, text) =>
      text.split(" ", -1).filter(_.nonEmpty).zipWithIndex
        .groupBy(_._2 / 8).map { case (seg, ws) =>
          (id, seg,
            ws.map { case (w, i) => h48(w) * (i % 8 + 1) }.sum.toLong)
        }
    }
    val dfBySig = segs.groupBy(_._3).view
      .mapValues(_.map(_._1).distinct.size).toMap
    val exp = segs.groupBy(_._1).map { case (id, ss) =>
      val dropped = ss.count(s => dfBySig(s._3) >= 3)
      val keptChk = ss.filter(s => dfBySig(s._3) < 3).map(_._3 % 1000003).sum
      (id, ss.size.toLong, dropped.toLong, keptChk,
        BigDecimal(dropped.toDouble / ss.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    val got = run("dedup_lines").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == exp,
      s"missing ${(exp -- got).take(3)}, extra ${(got -- exp).take(3)}")
    // order sensitivity: a permuted segment must not alias the original
    assert(h48("alpha") * 1 + h48("beta") * 2 != h48("beta") * 1 + h48("alpha") * 2)
  }
}
