package graft

/** Permanent form of the round-5 off-gate catch: every capacity-pinned
  * query must be inside its exact regime at EVERY SF present locally —
  * sf0.001 (spec fixture), sf0.01 (driver correctness gate) and sf0.1
  * (driver bench SF). When the driver bumps its SF, this fails loudly
  * with the constant to bump instead of letting the oracle diverge
  * silently.
  */
class CapacityRegimeSpec extends SparkSpecBase {

  private val driverDirs = Seq("/root/testdata/sf0.001",
    "/root/testdata/sf0.01", "/root/testdata/sf0.1")

  private val sfDirs = (driverDirs ++ Seq(
      "/root/repo/testdata-local/sf1",   // 10× probe from graft.GenTestData
      "/root/repo/testdata-local/sf3",   // 30× probe (r10: full-gate SF)
      "/root/repo/testdata-local/sf10")) // 100× probe (r12: full-sweep SF)
    .filter(d => java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)))

  test("fixture sanity: every driver SF is present and audited") {
    // each named individually: the optional sf1 probe must never mask a
    // missing DRIVER dir (sf0.1 is where the r5 off-regime incident lived)
    driverDirs.foreach { d =>
      assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(d)),
        s"driver SF dir missing: $d")
    }
  }

  sfDirs.foreach { dir =>
    test(s"every capacity pin holds at $dir") {
      val rows = CapacityPins.audit(spark, dir) // throws naming the violator
      assert(rows.size == CapacityPins.pins.size + CapacityPins.floorPins.size)
      info(rows.map { case (q, cap, m) => s"$q: $m/$cap" }.mkString(", "))
    }
  }
}
