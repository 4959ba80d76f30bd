package graft

import org.scalatest.funsuite.AnyFunSuite

/** The ±2× regression gate is only as real as the anchor parse: an anchor
  * file that silently parses to an empty map turns the gate OFF with
  * `anchor_worst: null` as the only symptom (this happened in r14 when a
  * pretty-printed rewrite added spaces after the JSON colons). This spec
  * fails loudly if the COMMITTED anchor stops parsing or stops covering
  * the query bank.
  */
class AnchorFormatSpec extends AnyFunSuite {

  test("BASELINE_ANCHOR.json parses and covers the query bank") {
    val m = Bench.parseAnchor("BASELINE_ANCHOR.json", "/root/testdata/sf0.1")
    assert(m.size >= 290, s"anchor parsed only ${m.size} entries")
    val missing = SparkEntry.queries.keySet -- m.keySet
    assert(missing.isEmpty,
      s"queries with no anchor entry (gate blind spots): ${missing.toSeq.sorted}")
    assert(m.values.forall(v => v > 0 && v < 1e4), "implausible anchor value")
  }

  test("BASELINE_ANCHOR_SF10.json parses and covers the query bank") {
    val m = Bench.parseAnchor("BASELINE_ANCHOR_SF10.json", "testdata-local/sf10")
    assert(m.size >= 300, s"sf10 anchor parsed only ${m.size} entries")
    val missing = SparkEntry.queries.keySet -- m.keySet
    assert(missing.isEmpty,
      s"queries with no sf10 anchor entry (gate blind spots): ${missing.toSeq.sorted}")
    assert(m.values.forall(v => v > 0 && v < 1e4), "implausible anchor value")
    // and it must NOT apply to the sf0.1 gate
    assert(Bench.parseAnchor("BASELINE_ANCHOR_SF10.json", "/root/testdata/sf0.1").isEmpty)
  }

  test("parseAnchor tolerates pretty-printed and compact spellings") {
    val tmp = java.nio.file.Files.createTempFile("anchor", ".json")
    val pretty =
      """{"metric": "total", "sf": "/x/sf0.1",
        |  "queries": {"q1_agg": 0.686, "trending_topk": 0.696}}""".stripMargin
    java.nio.file.Files.write(tmp, pretty.getBytes("UTF-8"))
    val m = Bench.parseAnchor(tmp.toString, "/y/sf0.1")
    assert(m == Map("q1_agg" -> 0.686, "trending_topk" -> 0.696))
    // SF-dir basename mismatch must disable the anchor, not misapply it
    assert(Bench.parseAnchor(tmp.toString, "/y/sf10").isEmpty)
  }
}
