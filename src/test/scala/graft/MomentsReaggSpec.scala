package graft

import graft.ops.AssociationStats.MomentCells
import org.apache.spark.sql.functions._

/** #284 `corr_reagg` — the -State/-Merge mergeability proof for second
  * moments: because every cell field is an exact decimal/integer sum,
  * folding ANY disjoint split of the corpus into cells and merging must
  * equal the one-pass computation bit-for-bit (the identity a 100 TB sink
  * relies on to maintain live correlations per flush without rescans).
  */
class MomentsReaggSpec extends SparkSpecBase {

  private def events = graft.sources.Tables(spark, sfDir, "events")

  test("cells merged from 3 disjoint slices == one-pass corr, bit-for-bit") {
    val full = MomentCells.corrFromCells(MomentCells.cells(events))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // split on a hash of event_id — deliberately NOT time-aligned, so the
    // per-(type, day) cells of different slices overlap and must merge
    val slices = (0 until 3).map(i =>
      MomentCells.cells(events.filter(pmod(col("event_id"), lit(3)) === i)))
    val merged = MomentCells.corrFromCells(
        slices.reduce(_ unionByName _))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(merged == full,
      s"merge diverged: ${merged.toSet diff full.toSet}")
    assert(full.nonEmpty && full.values.forall(v => !v._2.isNaN))
  }

  test("corr_reagg equals corr_moments' corr column (same exact partials)") {
    val viaCells = run("corr_reagg").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val onePass = run("corr_moments").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(viaCells == onePass)
  }
}
