package graft

/** Independent Scala re-derivations for the r9 pipeline additions
  * (#250-252) — brute-force folds over collected sf0.001 rows, sharing no
  * code with the operators under test.
  */
class PipelineR9bSpec extends SparkSpecBase {

  test("tok_fertility: counts re-derived by brute force") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val ws = ds.map(_._2.split(" ", -1).toSeq)
      val nw = ws.map(_.size.toLong).sum
      val bpe = ws.map(_.map(w => (w.length + 3) / 4).sum.toLong).sum
      val re = "[a-z]+|[0-9]+|[^a-z0-9 ]".r
      val reT = ds.map(d => re.findAllIn(d._2).size.toLong).sum
      lang -> (ds.size.toLong, nw, bpe, bpe.toDouble / nw, reT.toDouble / nw)
    }
    val got = run("tok_fertility").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (l, (nd, nw, bpe, bf, rf)) =>
      assert(got(l)._1 == nd && got(l)._2 == nw && got(l)._3 == bpe, l)
      assert(math.abs(got(l)._4 - bf) < 1e-3, s"$l bpe fertility")
      assert(math.abs(got(l)._5 - rf) < 1e-3, s"$l regex fertility")
    }
  }

  test("dedup_cluster_size_hist: consistent with dedup_clusters components") {
    val comps = run("dedup_clusters").collect()
      .map(r => r.getLong(1)) // cluster_id per member row
    val expected = comps.groupBy(identity).values.map(_.size)
      .groupBy(identity).map { case (sz, g) => sz.toLong -> g.size.toLong }
    val got = run("dedup_cluster_size_hist").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (sz, k) =>
      assert(got(sz)._1 == k, s"size $sz clusters")
      assert(got(sz)._2 == sz * k, s"size $sz docs")
      assert(got(sz)._3 == (sz - 1) * k, s"size $sz removable")
    }
    // every cluster in the pair graph has >= 2 members
    assert(expected.keys.min >= 2L)
  }

  test("label_centroid_stats: moments re-derived by brute force") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val expected = rows.groupBy(_._1).map { case (lab, vs) =>
      val qs = vs.map(_._2.map(e => math.floor(e.toDouble * 1e6).toLong))
      val n = qs.size.toLong
      val dim = qs.head.size
      var num = BigInt(0); var c2 = BigInt(0)
      (0 until dim).foreach { d =>
        val s1 = qs.map(q => BigInt(q(d))).sum
        val s2 = qs.map(q => BigInt(q(d)) * BigInt(q(d))).sum
        num += BigInt(n) * s2 - s1 * s1
        c2 += s1 * s1
      }
      lab.toLong -> (n, num.toDouble / (n.toDouble * n) / 1e12,
        math.sqrt(c2.toDouble / (n.toDouble * n) / 1e12))
    }
    val got = run("label_centroid_stats").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (lab, (n, msd, cn)) =>
      assert(got(lab)._1 == n, s"label $lab n")
      assert(math.abs(got(lab)._2 - msd) < 1e-4, s"label $lab msd")
      assert(math.abs(got(lab)._3 - cn) < 1e-4, s"label $lab centroid norm")
    }
  }

  test("mm_phash_pairs: banded pairs equal brute-force hamming<=2 set") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // independent phash re-derivation (8-bit luma blocks — the codec masks
    // codepoints to one byte when rendering the scene — integer compare)
    def ph(t: String): Long = {
      val cps = (t.codePoints().toArray.map(_ & 0xFF).take(240) ++
        Array.fill(240)(32)).take(240)
      val tot = cps.map(_.toLong).sum
      (0 until 60).foldLeft(0L) { (h, b) =>
        val bs = (0 until 4).map(j => cps(b * 4 + j).toLong).sum
        if (bs * 60 > tot) h | (1L << b) else h
      }
    }
    val hs = docs.map { case (id, t) => (id, ph(t)) }
    val expected = (for {
      i <- hs.indices; j <- i + 1 until hs.length
      d = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2)
      if d <= 2
    } yield {
      val (a, b) = if (hs(i)._1 < hs(j)._1) (hs(i)._1, hs(j)._1)
                   else (hs(j)._1, hs(i)._1)
      (a, b, d.toLong)
    }).toSet
    val got = run("mm_phash_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 3 bands pigeonhole-guarantee radius-2 recall; no bucket exceeds the
    // cap at this SF, so the banded set is EXACTLY the brute-force set
    assert(got == expected,
      s"diff: ${(got diff expected).take(3)} / ${(expected diff got).take(3)}")
    assert(expected.nonEmpty, "fixture produced no near-dup pairs")
  }
}
