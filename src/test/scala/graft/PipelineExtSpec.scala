package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The late-r6 pipeline additions (#99-#101): sequence packing, stratified
  * sampling and int8 embedding quantization — semantics pinned against
  * independent Scala re-derivations plus edge-case fixtures.
  */
class PipelineExtSpec extends SparkSpecBase {

  test("seq_packing equals concat-and-chunk over per-source doc_id order") {
    val got = run("seq_packing").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap

    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val B = 128L
    var boundaryCrossers = 0
    docs.groupBy(_._2).foreach { case (src, ds) =>
      var cum = 0L
      ds.sortBy(_._1).foreach { case (id, _, text) =>
        val tokens = text.split(" ", -1).length.toLong
        cum += tokens
        val start = (cum - tokens) / B
        val end = (cum - 1) / B
        val (gSrc, gTok, gStart, gEnd, gN) = got(id)
        assert(gSrc == src && gTok == tokens, s"doc $id meta")
        assert(gStart == start && gEnd == end, s"doc $id span")
        assert(gN == end - start + 1, s"doc $id n_chunks")
        if (end > start) boundaryCrossers += 1
      }
    }
    assert(boundaryCrossers > 0, "no doc ever crosses a chunk boundary — vacuous")
    assert(got.size == docs.length)
  }

  test("stratified_sample: deterministic md5 rule, per-lang rates") {
    val kept = run("stratified_sample").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap

    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val denoms = Map("en" -> 2L, "de" -> 3L, "fr" -> 4L).withDefaultValue(5L)
    val expect = docs.filter { case (id, lang) =>
      h60(s"strat:$id") % denoms(lang) == 0
    }.toMap
    assert(kept == expect)
    // every stratum must keep some and drop some at this SF
    docs.groupBy(_._2).foreach { case (lang, ds) =>
      val k = ds.count(d => kept.contains(d._1))
      assert(k > 0, s"$lang kept nothing")
      assert(k < ds.length, s"$lang kept everything")
      // rate sanity: ~1/denom with generous slack for small strata
      val rate = k.toDouble / ds.length
      assert(math.abs(rate - 1.0 / denoms(lang)) < 0.2, s"$lang rate=$rate")
    }
  }

  test("embed_quantize: int8 range, dequantization error bound, determinism") {
    val rows = run("embed_quantize").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    val embs = graft.sources.Tables(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(rows.length == embs.size)
    rows.foreach { case (id, scale, qs) =>
      val q = qs.split(",").map(_.toLong)
      val x = embs(id)
      assert(q.length == x.length, s"vec $id length")
      assert(q.forall(v => v >= -127 && v <= 127), s"vec $id range")
      // symmetric quantization maps the absolute max to ±127
      assert(q.map(math.abs).max == 127L, s"vec $id absmax")
      // dequantization error ≤ half a quantization step
      val step = 1.0 / scale
      x.zip(q).foreach { case (xv, qv) =>
        assert(math.abs(xv.toDouble - qv / scale) <= 0.5 * step + 1e-12,
          s"vec $id dequant err")
      }
    }
  }

  test("pii_scrub: counts follow the fixture parity, redaction verified by md5") {
    val got = run("pii_scrub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.length == docs.size)
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (id, nEmails, nPhones, redactedMd5) =>
      assert(nEmails == (if (id % 3 != 0) 1L else 0L), s"doc $id emails")
      assert(nPhones == (if (id % 2 == 0) 1L else 0L), s"doc $id phones")
      val raw = docs(id) +
        (if (id % 3 != 0) s" contact user$id@mail.example.com" else "") +
        (if (id % 2 == 0) f" call +1-555-${id % 10000}%04d" else "")
      val redacted = raw
        .replaceAll("[a-z0-9.]+@[a-z0-9.]+[.][a-z]+", "<EMAIL>")
        .replaceAll("[+]1-555-[0-9]{4}", "<PHONE>")
      val hex = md.digest(redacted.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(hex == redactedMd5, s"doc $id redaction")
      assert(!redacted.contains("@") && !redacted.contains("+1-555-"), s"doc $id leak")
    }
  }

  test("quantize_i8 edge cases: all-zero vector, clamp, negative max") {
    graft.functions.GraftFunctions.register(spark)
    val schema = StructType(Seq(
      StructField("id", IntegerType),
      StructField("v", ArrayType(FloatType))))
    val data = Seq(
      Row(0, Seq(0.0f, 0.0f, 0.0f)),            // all-zero → zeros, scale null
      Row(1, Seq(1.0f, -1.0f, 0.5f)),           // exact boundary hits ±127
      Row(2, Seq(-2.0f, 1.0f)),                 // negative absolute max
      Row(3, null)                              // null passthrough
    )
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(data, 1), schema)
      .select(col("id"),
        call_function("vec_absmax", col("v")).as("mx"),
        call_function("quantize_i8", col("v")).as("q"))
      .orderBy("id")
    val out = df.collect()
    assert(out(0).getDouble(1) == 0.0 && out(0).getString(2) == "0,0,0")
    assert(out(1).getDouble(1) == 1.0)
    assert(out(1).getString(2) == "127,-127,64") // 0.5*127+0.5 = 64.0 exactly
    assert(out(2).getDouble(1) == 2.0)
    assert(out(2).getString(2) == "-127,64")     // 1*63.5+0.5 = 64
    assert(out(3).isNullAt(1) && out(3).isNullAt(2))
  }

  test("doc_chunk: stride-150 windows with 50-char overlap, md5-verified content") {
    val got = run("doc_chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val md = java.security.MessageDigest.getInstance("MD5")
    var tails = 0
    val expected = docs.flatMap { case (id, text) =>
      (1 to text.length by 150).map { pos =>
        val chunk = text.substring(pos - 1, math.min(pos - 1 + 200, text.length))
        if (chunk.length < 200) tails += 1
        val hex = md.digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (id, pos.toLong) -> ((chunk.length.toLong, hex))
      }
    }.toMap
    assert(got == expected)
    assert(tails > 0, "no short tail chunk at this SF — clamp untested")
    // consecutive chunks of one doc overlap by 50 chars (stride < window)
    val (id0, text0) = docs.find(_._2.length > 350).get
    val c0 = text0.substring(0, 200); val c1 = text0.substring(150, 350)
    assert(c0.takeRight(50) == c1.take(50), s"doc $id0 overlap")
  }

  test("shard_assign: md5-mod shards with membership+order proved by the chain") {
    val got = run("shard_assign").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val byShard = docs.map { case (id, nc) => (h60(s"shard:$id") % 16, id, nc) }
      .groupBy(_._1)
    assert(got.keySet == byShard.keySet && got.size == 16,
      "expected all 16 shards populated")
    byShard.foreach { case (shard, ds) =>
      val (n, sumChars, chain) = got(shard)
      assert(n == ds.length.toLong, s"shard $shard size")
      assert(sumChars == ds.map(_._3).sum, s"shard $shard chars")
      val joined = ds.map(d => (h60(s"shard:${d._2}"), d._2)).sorted
        .map(_._2).mkString(",")
      val hex = md.digest(joined.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(hex == chain, s"shard $shard membership/order chain")
    }
    // a doc's shard is a pure function of its id: stable across SFs by
    // construction (no corpus-dependent state in the assignment)
  }

  private def docTokens: Array[(Long, Array[String])] =
    graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tfidf_topterms: exact tf/df, clamped score, top-3 by (score, tok)") {
    val docs = docTokens
    val nd = docs.length.toLong
    val tf = docs.flatMap { case (id, ts) =>
      ts.filter(_.nonEmpty).groupBy(identity).map { case (t, g) =>
        (id, t, g.length.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.length.toLong }
    val expect = tf.map { case (id, t, f) =>
      (id, t, f, df(t), round4(f * math.log(nd.toDouble / df(t))))
    }.groupBy(_._1).filter(_._1 < 100).toSeq.flatMap { case (_, rows) =>
      rows.toSeq.sortBy(r => (-r._5, r._2)).take(3)
    }.toSet

    val got = run("tfidf_topterms").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expect)
    assert(expect.exists(_._4 > 1), "every term unique — idf weighting vacuous")
  }

  test("bm25_topdocs: Okapi scores re-derived, top-10 by (score, doc)") {
    val docs = docTokens
    val nd = docs.length.toLong
    val counts = docs.map { case (id, ts) =>
      (id, ts.count(_.nonEmpty).toLong, ts.count(_ == "spark").toLong,
        ts.count(_ == "merge").toLong, ts.count(_ == "hash").toLong)
    }
    val tl = counts.map(_._2).sum
    val dfs = Seq(counts.count(_._3 > 0).toLong, counts.count(_._4 > 0).toLong,
      counts.count(_._5 > 0).toLong)
    val avgdl = tl.toDouble / nd
    def term(tf: Long, df: Long, dl: Long): Double =
      math.log(1 + (nd - df + 0.5) / (df + 0.5)) * tf /
        (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    val expect = counts.map { case (id, dl, t1, t2, t3) =>
      (id, round4(term(t1, dfs(0), dl) + term(t2, dfs(1), dl)
        + term(t3, dfs(2), dl)))
    }.sortBy { case (id, sc) => (-sc, id) }.take(10).toSeq

    val got = run("bm25_topdocs").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect)
    assert(expect.head._2 > 0, "no doc matches any query term — vacuous")
  }

  test("bpe_pair_stats: adjacent-pair counts, top-20 by (count, pair)") {
    val pairs = docTokens.flatMap { case (_, ts) =>
      ts.dropRight(1).zip(ts.drop(1)).map { case (a, b) => s"$a $b" }
    }
    val expect = pairs.groupBy(identity).map { case (p, g) =>
      (p, g.length.toLong) }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(20)

    val got = run("bpe_pair_stats").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
    assert(expect.head._2 > 1, "all pairs unique — merge-candidate count vacuous")
  }
}
