package graft

/** Permanent form of the round-5 off-gate catch: every capacity-pinned
  * query must be inside its exact regime at EVERY SF present locally —
  * sf0.001 (spec fixture), sf0.01 (driver correctness gate) and sf0.1
  * (driver bench SF). When the driver bumps its SF, this fails loudly
  * with the constant to bump instead of letting the oracle diverge
  * silently.
  */
class CapacityRegimeSpec extends SparkSpecBase {

  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1",
      "/root/repo/testdata-local/sf1") // 10× probe from graft.GenTestData
    .filter(d => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))

  test("fixture sanity: the three driver SFs are present") {
    assert(sfDirs.size >= 3, s"expected >= 3 SF dirs, found $sfDirs")
  }

  sfDirs.foreach { dir =>
    test(s"every capacity pin holds at $dir") {
      val rows = CapacityPins.audit(spark, dir) // throws naming the violator
      assert(rows.size == CapacityPins.pins.size + CapacityPins.floorPins.size)
      info(rows.map { case (q, cap, m) => s"$q: $m/$cap" }.mkString(", "))
    }
  }
}
