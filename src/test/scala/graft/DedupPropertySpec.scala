package graft

import scala.util.Random

/** Randomized completeness property of the AllPairs/PPJoin prefix filter
  * (`Dedup.prefixCandidates`): over seeded random corpora — small vocab, so
  * shingles collide hard and near-dup families appear by chance — EVERY
  * pair whose true Jaccard (resp. containment) clears τ must appear in the
  * candidate set, for both the prefix-prefix Jaccard regime and the
  * full-vs-prefix containment regime, at several τ. The DedupSpec fixture
  * pins curated corner cases; this sweeps the space the fixture can't
  * enumerate. (Soundness needs no test: candidates are always re-verified
  * exactly — completeness is the only property a filter can lose.)
  */
class DedupPropertySpec extends SparkSpecBase {

  private val rng = new Random(1729L)

  private def randomCorpus(): Seq[(Long, String, String, String)] = {
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val nDocs = 8 + rng.nextInt(10)
    (1L to nDocs).map { i =>
      val len = 3 + rng.nextInt(8)
      val text = Vector.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      val block = if (rng.nextBoolean()) "web" else "news"
      (i, "en", block, text)
    }
  }

  private def shingles(t: String): Set[String] = {
    val ws = t.split(" ")
    if (ws.length < 3) Set.empty
    else (0 to ws.length - 3).map(i => ws.slice(i, i + 3).mkString(" ")).toSet
  }

  test("prefix filter is complete on random corpora, every τ, both metrics") {
    import spark.implicits._
    for (trial <- 1 to 10) {
      val corpus = randomCorpus()
      val docsDf = corpus.toDF("doc_id", "lang", "source", "text")
      val rows = corpus.map(r => (r._1, (r._2, r._3), shingles(r._4)))
        .filter(_._3.nonEmpty)
      val e = graft.dedup.Dedup.shingleRowsOf(docsDf)
      for ((tauNum, tauDen, sizeTau, both, metric) <- Seq(
          (1, 2, 0.5, true, "jaccard"),
          (3, 10, 0.3, true, "jaccard"),
          (7, 10, 0.0, false, "containment"),
          (1, 2, 0.0, false, "containment"))) {
        val tau = tauNum.toDouble / tauDen
        val want = (for {
          (a, blkA, sa) <- rows; (b, blkB, sb) <- rows
          if a < b && blkA == blkB
          i = sa.intersect(sb).size.toDouble
          m = if (metric == "jaccard") i / (sa.size + sb.size - i)
              else i / math.min(sa.size, sb.size)
          if m >= tau
        } yield (a, b)).toSet
        val got = graft.dedup.Dedup.prefixCandidates(e, tauNum, tauDen,
            sizeTau, both)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(want.subsetOf(got),
          s"trial $trial $metric τ=$tauNum/$tauDen lost " +
            s"${(want -- got).take(5)} of ${want.size}; corpus=$corpus")
      }
    }
  }
}
