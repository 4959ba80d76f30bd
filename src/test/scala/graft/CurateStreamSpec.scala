package graft

import graft.streaming.CurateStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Emission + state spec for the end-to-end streaming curation pipeline
  * (#261): a 3-micro-batch ordered replay through the REAL foreachBatch
  * stream must produce EXACTLY the single-shot whole-corpus kept-set (every
  * screen is stateless or keyed by a monotone first-arrival rule), and the
  * simhash index state must respect the first-cap bound per bucket.
  */
class CurateStreamSpec extends SparkSpecBase {

  private def fixtureDocs = graft.sources.Tables(spark, sfDir, "documents")
    .select("doc_id", "lang", "source", "text")

  private def benchGrams = graft.dedup.Dedup
    .gramRows(fixtureDocs.filter(col("doc_id") % 10 === 0), 8)
    .select("h").distinct()

  test("3-batch ordered replay emits exactly the single-shot kept set") {
    implicit val s = spark
    import s.implicits._
    val cap = graft.dedup.Dedup.lshBucketCap(spark)
    val out = java.nio.file.Files.createTempDirectory("curate_stream").toString
    val bench = benchGrams.cache()

    val rows = fixtureDocs.as[(Long, String, String, String)]
      .collect().sortBy(_._1)
    val thirds = rows.grouped((rows.length + 2) / 3).toSeq
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, String, String)]
    val q = CurateStream.start(
      in.toDF().toDF("doc_id", "lang", "source", "text"),
      out, bench, minQuality = 0.25, cap = cap)
    for (chunk <- thirds) { in.addData(chunk.toSeq); q.processAllAvailable() }
    q.stop()

    val streamed = CurateStream.keptAll(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val single = CurateStream.curateBatch(fixtureDocs,
        CurateStream.emptyMd5(spark), CurateStream.emptySim(spark),
        bench, minQuality = 0.25, cap = cap)
      .kept.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed == single,
      s"stream-only: ${(streamed diff single).take(3)}; " +
        s"single-only: ${(single diff streamed).take(3)}")
    assert(single.nonEmpty, "fixture kept-set vacuous")
    // non-vacuity per screen: the corpus must exercise every drop reason
    val n = fixtureDocs.count()
    assert(single.size < n - n / 10,
      "no screen dropped anything beyond the benchmark holdout")
    // persisted simhash index state respects the first-cap bucket bound
    val (_, simIdx) = CurateStream.latestState(spark, out).get
    val overCap = simIdx
      .groupBy("b", "bkey").count().filter(col("count") > cap).count()
    assert(overCap == 0, "a simhash index bucket exceeded the cap")
    bench.unpersist()
  }

  test("crash between kept/state writes and cursor commit: replay heals, no dup/loss") {
    implicit val s = spark
    import s.implicits._
    val out = java.nio.file.Files.createTempDirectory("curate_crash").toString
    val bench = benchGrams.cache()
    val rows = fixtureDocs.as[(Long, String, String, String)]
      .collect().sortBy(_._1)
    val (h1, h2) = rows.splitAt(rows.length / 2)
    def df(c: Seq[(Long, String, String, String)]) =
      c.toDF("doc_id", "lang", "source", "text")

    // batch 0 commits normally
    CurateStream.processBatch(df(h1.toSeq), 0L, out, bench, 0.25, 16)
    val keptAt0 = CurateStream.keptAll(spark, out).collect()
      .map(_.getLong(0)).toSet

    // simulate batch 1 crashing AFTER its kept/state versions landed (with
    // GARBAGE contents, like a half-finished job) but BEFORE the cursor
    // commit — the failure window the verdict named
    df(h2.take(1).toSeq).select(col("doc_id"), col("lang"),
        lit(-1.0).as("quality"))
      .write.mode("overwrite").parquet(s"$out/kept/batch=1")
    CurateStream.emptyMd5(spark)
      .write.mode("overwrite").parquet(s"$out/state/md5_seen_v1")

    // reader view: the orphan version is invisible (cursor is the txn point)
    assert(CurateStream.keptAll(spark, out).collect()
      .map(_.getLong(0)).toSet == keptAt0, "uncommitted version leaked")

    // replay of batch 1 rebuilds from batch 0's committed state and
    // overwrites the orphans; a second replay is a no-op
    CurateStream.processBatch(df(h2.toSeq), 1L, out, bench, 0.25, 16)
    CurateStream.processBatch(df(h2.toSeq), 1L, out, bench, 0.25, 16)
    val healed = CurateStream.keptAll(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(healed.length == healed.distinct.length, "duplicate kept docs")
    // and the final kept set equals the clean 2-batch run
    val clean = java.nio.file.Files.createTempDirectory("curate_clean").toString
    CurateStream.processBatch(df(h1.toSeq), 0L, clean, bench, 0.25, 16)
    CurateStream.processBatch(df(h2.toSeq), 1L, clean, bench, 0.25, 16)
    val expect = CurateStream.keptAll(spark, clean).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(healed.toSet == expect,
      s"crash-replay diverged: ${(healed.toSet diff expect).take(3)} / " +
        s"${(expect diff healed.toSet).take(3)}")
    bench.unpersist()
  }

  test("screens drop the right docs: exact dup, near dup, contaminated") {
    implicit val s = spark
    import s.implicits._
    // hand fixture: doc 1 kept; 2 = byte-dup of 1 (exact screen); 21 =
    // same DISTINCT word set as 11 with two repeats appended (simhash is
    // over the distinct set → hamming 0, deterministic; md5 differs so the
    // exact screen does NOT absorb it); 30 is benchmark (holdout); 31
    // shares 30's full ≥8-word run (contamination); 41 = low quality.
    // Quality floor: ≥25 distinct words → min(n,100)/100·(0.5+0.5·dr)
    // ≥ 0.25. ids chosen so %10 marks only 30.
    def ws(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val base = ws("a", 30)
    val nearA = ws("n", 30)
    val nearB = nearA + " n1 n2"
    val benchTxt = ws("b", 12)
    val docsDf = Seq(
      (1L, "en", "web", base),
      (2L, "en", "web", base),
      (11L, "en", "web", nearA),
      (21L, "en", "web", nearB),
      (30L, "en", "web", benchTxt),
      (31L, "en", "web", benchTxt + " " + ws("c", 20)),
      (41L, "en", "web", "tiny doc")
    ).toDF("doc_id", "lang", "source", "text")
    val bench = graft.dedup.Dedup
      .gramRows(docsDf.filter(col("doc_id") % 10 === 0), 8)
      .select("h").distinct()
    val kept = CurateStream.curateBatch(docsDf,
        CurateStream.emptyMd5(spark), CurateStream.emptySim(spark),
        bench, minQuality = 0.25, cap = 16)
      .kept.collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 11L),
      s"expected {1, 11} (2 exact-dup, 21 near-dup, 30 holdout, " +
        s"31 contaminated, 41 low-quality); got $kept")
  }
}
