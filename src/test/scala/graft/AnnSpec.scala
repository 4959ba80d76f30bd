package graft

import graft.ann.Ann

class AnnSpec extends SparkSpecBase {

  private lazy val bf = run("ann_bruteforce").collect()

  test("bruteforce returns exactly k neighbors per probe") {
    val byProbe = bf.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byProbe.size == Ann.NumProbes)
    assert(byProbe.values.forall(_ == Ann.K))
  }

  test("bruteforce neighbors are ranked by cosine desc and never the probe itself") {
    bf.groupBy(_.getLong(0)).foreach { case (pid, rows) =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getDouble(3)).sliding(2).forall(w => w(0) >= w(1)))
      assert(!rows.exists(_.getLong(1) == pid))
    }
  }

  test("lsh recall@5: multiprobe ≥ 0.8 and strictly lifts single-probe ≥ 0.5") {
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(bf)
    def recallAt(multiprobe: Int) = {
      val approx = pairs(Ann.lshTopK(spark, sfDir, multiprobe = multiprobe).collect())
      approx.intersect(exact).size.toDouble / exact.size
    }
    val single = recallAt(0)
    val multi = recallAt(1)
    assert(single >= 0.5, s"single-probe recall $single")
    assert(multi >= 0.8, s"multiprobe recall $multi")
    assert(multi >= single, s"multiprobe $multi must not lose to single $single")
  }

  test("ivf recall@5: nprobe cells beat a single cell; ≥ 0.5 at nprobe=4/8") {
    def pairs(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(bf)
    def recallAt(nprobe: Int) = {
      val approx = pairs(Ann.ivfTopK(spark, sfDir, nprobe = nprobe).collect())
      approx.intersect(exact).size.toDouble / exact.size
    }
    val one = recallAt(1)
    val four = recallAt(4)
    assert(four >= 0.5, s"ivf nprobe=4 recall $four")
    assert(four >= one, s"more probed cells must not lose recall ($four vs $one)")
    // vectors store ONE cell row each (vs L bucket rows in LSH)
    assert(Ann.ivfTopK(spark, sfDir).collect().nonEmpty)
  }

  test("deterministic hyperplanes are reproducible and bounded") {
    val a = Ann.hyperplanes
    assert(a.length == Ann.Tables_ && a(0).length == Ann.Bits && a(0)(0).length == Ann.Dim)
    assert(a.flatten.flatten.forall(w => w >= -1.0 && w <= 1.0))
  }
}
