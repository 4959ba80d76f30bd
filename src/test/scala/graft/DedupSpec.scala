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

  test("df-cap drops a hot shingle from ngram candidate generation") {
    import spark.implicits._
    // 40 docs share ONE boilerplate 3-gram ("hot hot hot"); all other
    // shingles are doc-unique. Uncapped, the hot shingle alone emits the
    // full 40·39/2 pair blowup; with df-cap 8 it is excluded and no
    // candidates survive.
    val docsDf = (1L to 40L).map { i =>
      (i, "en", "web", s"hot hot hot u$i v$i w$i x$i")
    }.toDF("doc_id", "lang", "source", "text")
    val e = graft.dedup.Dedup.shingleRowsOf(docsDf)
    val uncapped = graft.dedup.Dedup.ngramCandidates(e, tau = 0.0, dfCap = Int.MaxValue)
    val capped = graft.dedup.Dedup.ngramCandidates(e, tau = 0.0, dfCap = 8)
    assert(uncapped.count() == 40L * 39 / 2)
    assert(capped.count() == 0)
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

  test("hot-key caps are runtime-tunable via spark conf and public API params") {
    import spark.implicits._
    val hotNgram = (1L to 40L).map { i =>
      (i, "en", "web", s"hot hot hot u$i v$i w$i x$i")
    }.toDF("doc_id", "lang", "source", "text")
    val hotSim = (1L to 40L)
      .map(i => (i, "all the same boilerplate text body here"))
      .toDF("doc_id", "text")
    try {
      // conf knob reaches the full public operators without explicit params
      spark.conf.set(graft.dedup.Dedup.NgramDfCapKey, "8")
      spark.conf.set(graft.dedup.Dedup.LshBucketCapKey, "8")
      assert(graft.dedup.Dedup.ngramDfCap(spark) == 8)
      assert(graft.dedup.Dedup.lshBucketCap(spark) == 8)
      assert(graft.dedup.Dedup.ngramJaccardPairs(hotNgram, tau = 0.0).count() == 0,
        "conf-set df-cap must reach ngramJaccardPairs")
      assert(graft.dedup.Dedup.simhashPairsOf(hotSim).count() == 0,
        "conf-set bucket cap must reach simhashPairsOf")
      // explicit param overrides the conf (40 identical docs, cap 100 holds them)
      assert(graft.dedup.Dedup.simhashPairsOf(hotSim, bucketCap = 100).count()
        == 40L * 39 / 2)
    } finally {
      spark.conf.unset(graft.dedup.Dedup.NgramDfCapKey)
      spark.conf.unset(graft.dedup.Dedup.LshBucketCapKey)
    }
    // defaults restored: conf-free resolution falls back to the constants
    assert(graft.dedup.Dedup.ngramDfCap(spark) == graft.dedup.Dedup.NgramDfCap)
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

  test("containment pairs equal the exact df-capped shingle-set oracle") {
    // independent Scala re-derivation: same 3-gram/h32 shingles, same
    // df-capped block candidate generation, containment over FULL sets
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
    val dfCap = graft.dedup.Dedup.ngramDfCap(spark)
    val df = sets.flatMap { case ((_, blk), sh) => sh.map(blk -> _) }
      .groupBy(identity).map { case (k, v) => k -> v.length }
    val surviving: ((String, String), Long) => Boolean =
      (blk, h) => df((blk, h)) <= dfCap
    val exp = (for {
      ((a, blkA), sa) <- sets; ((b, blkB), sb) <- sets
      if a < b && blkA == blkB
      shared = sa.intersect(sb)
      if shared.exists(surviving(blkA, _)) // block-join candidate
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
}
