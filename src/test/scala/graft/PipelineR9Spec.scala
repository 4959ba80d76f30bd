package graft

/** Independent Scala re-derivations for the r9 pipeline additions
  * (#243-244) — brute-force folds over collected sf0.001 rows, sharing no
  * code with the operators under test.
  */
class PipelineR9Spec extends SparkSpecBase {

  test("dsir_logratio: scores re-derived by brute force") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, text.split(" ", -1).toSeq)
    }
    val na = scala.collection.mutable.Map[String, Long]()
    val nt = scala.collection.mutable.Map[String, Long]()
    toks.foreach { case (_, lang, ws) =>
      ws.foreach { w =>
        na(w) = na.getOrElse(w, 0L) + 1
        if (lang == "en") nt(w) = nt.getOrElse(w, 0L) + 1
      }
    }
    val vocab = na.size.toLong
    val atot = na.values.sum
    val ttot = nt.values.sum
    def lw(w: String): Double =
      math.log((nt.getOrElse(w, 0L) + 1.0) / (ttot + vocab)) -
        math.log((na(w) + 1.0) / (atot + vocab))
    val expected = toks.filter(_._1 < 100).map { case (id, _, ws) =>
      id -> (ws.size.toLong, ws.map(lw).sum / ws.size)
    }.toMap
    val got = run("dsir_logratio").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, (n, sc)) =>
      assert(got(id)._1 == n, s"doc $id n_tok")
      assert(math.abs(got(id)._2 - sc) < 1e-3, s"doc $id score")
    }
    // sanity: English docs should score higher on average than non-English
    val byLang = toks.groupBy(_._2).map { case (l, ds) =>
      l -> ds.map(d => d._3.map(lw).sum / d._3.size).sum / ds.size
    }
    assert(byLang("en") > byLang.filter(_._1 != "en").values.max)
  }

  test("embed_dim_stats: moments re-derived by brute force") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("embedding").collect()
      .map(_.getSeq[Float](0)).toSeq
    val dim = vecs.head.size
    val got = run("embed_dim_stats").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(got.keySet == (1 to dim).map(_.toLong).toSet)
    (0 until dim).foreach { d =>
      val qs = vecs.map(v => math.floor(v(d).toDouble * 1e6).toLong)
      val n = qs.size.toLong
      val sq = qs.sum
      val ssq = qs.map(q => BigInt(q) * BigInt(q)).sum
      val mean = sq.toDouble / n / 1e6
      val std = math.sqrt(n.toDouble * ssq.toDouble -
        sq.toDouble * sq.toDouble) / n / 1e6
      val (gn, gm, gs, gmin, gmax) = got(d + 1L)
      assert(gn == n)
      assert(math.abs(gm - mean) < 1e-5, s"dim ${d + 1} mean")
      assert(math.abs(gs - std) < 1e-5, s"dim ${d + 1} std")
      assert(math.abs(gmin - qs.min.toDouble / 1e6) < 1e-5)
      assert(math.abs(gmax - qs.max.toDouble / 1e6) < 1e-5)
    }
  }
}
